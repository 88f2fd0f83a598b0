"""Deterministic Poseidon2 parameter generation.

Matrices follow ePrint 2023/323 §5:

* t = 2:  M_E = [[2,1],[1,2]],              M_I diag mu = (2, 3)
* t = 3:  M_E = circ(2,1,1),                M_I diag mu = (2, 2, 3)
* t = 4:  M_E = M4 (the paper's 4x4 matrix),
* t = 4k, k >= 2:  M_E = block-circulant with diagonal blocks 2*M4 and
  off-diagonal blocks M4,
* t >= 4: M_I = J + diag(mu - 1) with ``mu`` drawn from the Grain LFSR
  (rejection-sampled below p) until M_I is invertible and the diagonal
  entries are pairwise distinct and != 1.

Round constants are drawn from the same Grain LFSR construction the original
Poseidon parameters use (/root/reference/src/poseidon/grain_lfsr.rs, reused
via ``poseidon.params.PoseidonGrainLFSR``), seeded with
(sbox_inverse=False, prime_bits, t, R_F, R_P), in schedule order: the R_F
external rows (t elements each) first, then the R_P internal scalars, then
the diagonal ``mu`` draws for t >= 4.

NOTE: the reference crate has no Poseidon2, and no official cross-
implementation vectors are reachable in this offline environment, so these
defaults are a *self-consistent deterministic instance* of the Poseidon2
structure — the scalar oracle (``poseidon2.oracle``) is the ground truth the
device tiers are tested against.  Deployments matching a published instance
(e.g. the horizen-labs constants) should construct ``Poseidon2Config``
directly from those constants; every downstream component is constant-agnostic.
"""

from __future__ import annotations

import functools

from ..fields import FieldSpec
from ..poseidon.params import _DEFAULT_CAPACITY, _DEFAULT_TABLES, PoseidonGrainLFSR
from .config import Poseidon2Config

# The paper's 4x4 building block (ePrint 2023/323 §5.1).
_M4 = (
    (5, 7, 1, 3),
    (4, 6, 1, 1),
    (1, 3, 5, 7),
    (1, 1, 4, 6),
)


def external_matrix(t: int) -> tuple:
    """The small-integer external matrix M_E for state width ``t``."""
    if t == 2:
        return ((2, 1), (1, 2))
    if t == 3:
        return ((2, 1, 1), (1, 2, 1), (1, 1, 2))
    if t == 4:
        return _M4
    if t % 4 == 0:
        k = t // 4
        rows = []
        for bi in range(k):
            for r in range(4):
                row = []
                for bj in range(k):
                    scale = 2 if bi == bj else 1
                    row.extend(scale * v for v in _M4[r])
                rows.append(tuple(row))
        return tuple(rows)
    raise ValueError(
        f"Poseidon2 external matrix defined for t in {{2, 3}} or t % 4 == 0; got t={t}"
    )


def _mat_i_dense(t: int, diag, p: int) -> list:
    """Dense M_I = all-ones + diag(mu - 1) as python ints mod p."""
    return [
        [(diag[i] % p) if i == j else 1 for j in range(t)] for i in range(t)
    ]


def _det_mod_p(mat, p: int) -> int:
    """Determinant mod prime p by fraction-free Gaussian elimination."""
    m = [row[:] for row in mat]
    n = len(m)
    det = 1
    for col in range(n):
        pivot = next((r for r in range(col, n) if m[r][col] % p != 0), None)
        if pivot is None:
            return 0
        if pivot != col:
            m[col], m[pivot] = m[pivot], m[col]
            det = (-det) % p
        det = (det * m[col][col]) % p
        inv = pow(m[col][col], -1, p)
        for r in range(col + 1, n):
            f = (m[r][col] * inv) % p
            for c in range(col, n):
                m[r][c] = (m[r][c] - f * m[col][c]) % p
    return det % p


def internal_diag(t: int, fs: FieldSpec, lfsr: PoseidonGrainLFSR | None) -> tuple:
    """Diagonal ``mu`` of M_I for width ``t``.

    t = 2 and t = 3 use the paper's fixed small diagonals (which make the
    internal layer multiplication-free on limb planes); t >= 4 rejection-
    samples from the Grain stream until M_I is invertible with pairwise
    distinct diagonal entries not in {0, 1}.
    """
    if t == 2:
        return (2, 3)
    if t == 3:
        return (2, 2, 3)
    assert lfsr is not None
    p = fs.modulus
    while True:
        diag = tuple(lfsr.get_field_elements_rejection_sampling(fs, t))
        if len(set(diag)) != t or any(d in (0, 1) for d in diag):
            continue
        if _det_mod_p(_mat_i_dense(t, diag, p), p) != 0:
            return diag


def generate_poseidon2_parameters(
    fs: FieldSpec,
    rate: int,
    alpha: int,
    full_rounds: int,
    partial_rounds: int,
    capacity: int = 1,
) -> Poseidon2Config:
    """Deterministic Poseidon2 parameters for any supported width."""
    t = rate + capacity
    mat_e = external_matrix(t)
    lfsr = PoseidonGrainLFSR(
        False, fs.modulus_bit_size, t, full_rounds, partial_rounds
    )
    external_rc = tuple(
        tuple(lfsr.get_field_elements_rejection_sampling(fs, t))
        for _ in range(full_rounds)
    )
    internal_rc = tuple(
        lfsr.get_field_elements_rejection_sampling(fs, 1)[0]
        for _ in range(partial_rounds)
    )
    diag = internal_diag(t, fs, lfsr)
    return Poseidon2Config(
        field=fs,
        full_rounds=full_rounds,
        partial_rounds=partial_rounds,
        alpha=alpha,
        external_rc=external_rc,
        internal_rc=internal_rc,
        mat_e=mat_e,
        mat_i_diag=diag,
        rate=rate,
        capacity=capacity,
    )


@functools.lru_cache(maxsize=None)
def get_default_poseidon2_parameters(
    fs: FieldSpec, rate: int, optimized_for_weights: bool = False
) -> Poseidon2Config:
    """Default Poseidon2 parameters, reusing the per-field Poseidon round-count
    tables (rate, alpha, R_F, R_P) — the Poseidon2 paper derives its round
    numbers from the same formulas, so the Poseidon defaults are a (slightly
    conservative) valid choice for the same (field, t, alpha).

    Only rates whose t = rate + 1 has a defined external matrix (t in {2, 3}
    or t % 4 == 0) are available; others raise ValueError.
    """
    table = _DEFAULT_TABLES[fs.name][bool(optimized_for_weights)]
    capacity = _DEFAULT_CAPACITY.get(fs.name, 1)
    for rate_, alpha, full_rounds, partial_rounds, _skip in table:
        if rate_ == rate:
            return generate_poseidon2_parameters(
                fs, rate, alpha, full_rounds, partial_rounds, capacity
            )
    raise ValueError(f"no default Poseidon2 parameters for rate={rate}")
