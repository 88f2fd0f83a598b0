"""Optimized partial-round evaluation (sparse MDS decomposition).

The Poseidon partial round applies the S-box to state element 0 only, yet the
naive evaluation still pays a dense t x t MDS product per round
(/root/reference/src/poseidon/mod.rs:104-108).  The classic optimization (Hades
/ Poseidon paper appendix; also shipped by neptune/gnark) factors the partial
round chain so each round needs only a *sparse* matrix — dense first row,
dense first column, identity elsewhere — at the cost of one extra dense matrix
applied once after the chain.  The transformation is an exact algebraic
identity: outputs are bit-identical to the naive schedule (enforced against the
oracle in tests).

Derivation (in this codebase's ark -> sbox -> MDS round order).  Write a partial
round as F_r(x) = M·S(x + c_r) with S the element-0 S-box.  Using
A_c(x) = x + c and the commutation A_c∘M = M∘A_{M^{-1}c}, the k-round chain is

    G = M ∘ [S ∘ M ∘ A_{ĉ_k}] ∘ ... ∘ [S ∘ M ∘ A_{ĉ_2}] ∘ S ∘ A_{c_1},
    ĉ_r = M^{-1} c_r.

Each inner M factors as M = M'·M'' with M' = diag(1, M_hat) and M'' sparse
(M_hat = M[1:,1:], first row of M'' = first row of M, first column below =
M_hat^{-1}·M[1:,0]).  M' is identity on element 0 and its other rows ignore
element 0, so it commutes with S; pushing every M' leftward (transforming the
constant it crosses by M'^{-1}) accumulates all dense factors into one final
matrix D.  Evaluation:

    x += c_1;  x = S(x)
    for r = 2..k:   x += č_r;  x = Sp_r·x;  x = S(x)
    x = D·x

Cost per round: t + (t-1) products instead of t^2.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

from .config import PoseidonConfig


def _mat_vec(p, m, v):
    return tuple(sum(mij * vj for mij, vj in zip(row, v)) % p for row in m)


def _mat_mul(p, a, b):
    n = len(a)
    return tuple(
        tuple(sum(a[i][l] * b[l][j] for l in range(n)) % p for j in range(n))
        for i in range(n)
    )


def _mat_inv(p, m):
    """Gauss-Jordan inverse over GF(p) (tiny t x t matrices, host-side)."""
    n = len(m)
    aug = [list(row) + [int(i == j) for j in range(n)] for i, row in enumerate(m)]
    for col in range(n):
        piv = next(r for r in range(col, n) if aug[r][col] % p != 0)
        aug[col], aug[piv] = aug[piv], aug[col]
        inv = pow(aug[col][col], -1, p)
        aug[col] = [(x * inv) % p for x in aug[col]]
        for r in range(n):
            if r != col and aug[r][col]:
                f = aug[r][col]
                aug[r] = [(x - f * y) % p for x, y in zip(aug[r], aug[col])]
    return tuple(tuple(row[n:]) for row in aug)


@dataclass(frozen=True)
class SparseFactor:
    """One sparse partial-round matrix: dense first row, dense first column
    below the diagonal, identity elsewhere."""

    row0: Tuple[int, ...]   # length t
    col0: Tuple[int, ...]   # length t-1 (rows 1..t-1 of column 0)

    def apply(self, p, x):
        out0 = sum(r * v for r, v in zip(self.row0, x)) % p
        rest = tuple((c * x[0] + xi) % p for c, xi in zip(self.col0, x[1:]))
        return (out0,) + rest


@dataclass(frozen=True)
class OptimizedPartialLayers:
    """Precomputed optimized-partial-round schedule for one PoseidonConfig."""

    c_first: Tuple[int, ...]                  # ark row of the first partial round
    constants: Tuple[Tuple[int, ...], ...]    # č_r for r = 2..k (k-1 rows of t)
    sparse: Tuple[SparseFactor, ...]          # Sp_r for r = 2..k
    dense: Tuple[Tuple[int, ...], ...]        # final accumulated dense matrix D


def _factor(p, m):
    """M = M'·M'' with M' = diag(1, M_hat) and sparse M''; returns (M', M'')."""
    t = len(m)
    m_hat = tuple(tuple(m[i][j] for j in range(1, t)) for i in range(1, t))
    w = tuple(m[i][0] for i in range(1, t))
    m_hat_inv = _mat_inv(p, m_hat)
    w_hat = _mat_vec(p, m_hat_inv, w)
    m_prime = tuple(
        tuple(
            (1 if i == j == 0 else (m_hat[i - 1][j - 1] if i > 0 and j > 0 else 0))
            for j in range(t)
        )
        for i in range(t)
    )
    sparse = SparseFactor(row0=tuple(m[0]), col0=w_hat)
    return m_prime, sparse


@functools.lru_cache(maxsize=None)
def optimized_partial_layers(cfg: PoseidonConfig) -> OptimizedPartialLayers:
    """Derive the sparse factorization + transformed constants for ``cfg``."""
    p = cfg.field.modulus
    t = cfg.t
    k = cfg.partial_rounds
    half = cfg.full_rounds // 2
    m = tuple(tuple(row) for row in cfg.mds)
    if k < 2:
        raise ValueError("optimized schedule needs >= 2 partial rounds")

    m_inv = _mat_inv(p, m)
    ark = [tuple(cfg.ark[half + r]) for r in range(k)]  # partial-round rows

    c_first = ark[0]
    c_hat = [_mat_vec(p, m_inv, ark[r]) for r in range(1, k)]  # ĉ_2..ĉ_k

    # Factor round matrices right-to-left, accumulating M' factors upward.
    mats = [m] * k  # mats[i] = matrix applied after partial round i+1's sbox
    sparse = []
    for i in range(k - 1):
        m_prime, sp = _factor(p, mats[i])
        sparse.append(sp)
        # The popped M' exits round i+1's block through its S-box, then crosses
        # the NEXT block's trailing constant add (ĉ_{i+3} = c_hat[i+1]) — unless
        # it merges directly into the outer matrix (last factorization).
        if i + 1 <= k - 2:
            m_prime_inv = _mat_inv(p, m_prime)
            c_hat[i + 1] = _mat_vec(p, m_prime_inv, c_hat[i + 1])
        # ... and merges into the next round's matrix.
        mats[i + 1] = _mat_mul(p, mats[i + 1], m_prime)

    return OptimizedPartialLayers(
        c_first=c_first,
        constants=tuple(c_hat),
        sparse=tuple(sparse),
        dense=mats[k - 1],
    )


def eval_partial_chain_optimized(cfg: PoseidonConfig, state) -> tuple:
    """Scalar python-int evaluation of the optimized partial-round chain.

    Input/output: the full state tuple at the partial-phase boundary.  Must be
    bit-identical to running the naive partial rounds (oracle cross-check in
    tests/test_optimized.py).
    """
    p = cfg.field.modulus
    layers = optimized_partial_layers(cfg)

    def sbox0(x):
        return (pow(x[0], cfg.alpha, p),) + tuple(x[1:])

    x = tuple((xi + ci) % p for xi, ci in zip(state, layers.c_first))
    x = sbox0(x)
    for c, sp in zip(layers.constants, layers.sparse):
        x = tuple((xi + ci) % p for xi, ci in zip(x, c))
        x = sp.apply(p, x)
        x = sbox0(x)
    return _mat_vec(p, layers.dense, x)
