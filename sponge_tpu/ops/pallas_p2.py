"""Fused Pallas kernel for the Poseidon2 permutation (fast tier).

Poseidon2's linear layers (ePrint 2023/323) multiply only by small plain
integers (external M_E entries <= 14 for every defined width; internal
M_I = all-ones + diagonal), and scaling a Montgomery-form limb plane by a
plain integer is just ``c * x`` on the limbs — NO REDC.  The kernel therefore
spends Montgomery reductions exclusively on the S-box chains, which is the
whole point of Poseidon2.

**Value-growth discipline (the part that makes this sound).**  Unlike
Poseidon, whose every round ends in a Montgomery-reducing MDS product
(values stay < 2p), Poseidon2's linear layers never reduce, so element
VALUES grow by the matrix row sums round over round and would overflow the
L-limb window (values are represented mod R = 2^(12 L); a dropped top carry
is silent corruption).  The kernel keeps values < R at every multiplication
boundary by **rho-folding**: a carry ``c`` popped off the top limb is folded
back as ``c * rho`` with ``rho = R mod p`` (exact mod p, since
2^(12L) ≡ rho).  Fold counts per site are computed statically from exact
python-int value bounds (``_fold_count``), so no site ever drops a carry:

* linear-layer outputs stay *deferred* (un-normalized) and are folded by the
  next round's constant-add normalization (2-4 folds depending on R/p);
* S-box REDC tails produce values < R + p and need exactly one fold
  (threaded into ``pallas_cios._redc_multi`` via ``final_norm``);
* the permutation's last step Montgomery-multiplies each element by 1,
  restoring the framework-wide ``value < 2p`` output invariant that the
  duplex sponge's absorb-add and ``from_mont`` rely on.

Internal rounds with a small diagonal (t = 2, 3 paper values; any config
with entries < 2^4) run multiplication-free: out_i = sigma + (mu_i - 1) x_i
as scaled limb sums.  Larger diagonals fall back to one constant-operand
REDC per element (chains interleaved across elements and lane streams).

Layout, tiling and lane-stream interleaving follow ``pallas_cios`` (tiles
(t, L, SUBLANES, 128); 2 lane streams measured fastest, docs/DESIGN.md §6).
Bit-exactness vs the scalar oracle is enforced in tests/test_poseidon2.py
(tiny field in CI — which exercises the folding hard, since R/p is only
~2^4 there — and the full field on TPU via the bench parity gate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import LIMB_BITS, LIMB_MASK
from ..poseidon2.config import Poseidon2Config
from . import montgomery as mont
from .pallas_cios import (
    SUBLANES,
    TILE_LANES,
    _mul_cols,
    _norm1_multi,
    _pow_alpha_multi,
    _redc_multi,
)

__all__ = ["p2_permute_fn", "TILE_LANES", "SUBLANES"]

# Diagonal entries mu-1 below this scale with plain integer multiplies;
# larger ones use a constant-operand Montgomery product.
SMALL_DIAG_LIMIT = 1 << 4


def _fold_count(R: int, rho: int, vmax: int) -> int:
    """Number of top-carry folds guaranteeing value < R, from the exact
    exclusive value bound ``vmax``.

    One fold maps V = c*R + lo (lo < R) to c*rho + lo; the worst post-fold
    bound over V < vmax is max(cm*rho + (vmax-1 - cm*R), (cm-1)*rho + R-1)
    with cm = (vmax-1) // R.  Iterate until the bound fits below R.
    """
    folds = 0
    while vmax > R:
        cm = (vmax - 1) // R
        cand = cm * rho + (vmax - 1 - cm * R)
        if cm >= 1:
            cand = max(cand, (cm - 1) * rho + (R - 1))
        vmax = cand + 1
        folds += 1
        if folds > 16:
            raise AssertionError("rho-folding does not converge; bad field spec")
    return folds


def _limbs_vmax(R: int, deferred_limb_bound: int) -> int:
    """Exclusive value bound of a limb list with limbs <= deferred_limb_bound."""
    return deferred_limb_bound * ((R - 1) // LIMB_MASK) + 1


def _fold_norm_multi(lists, rho_limbs, folds: int):
    """Exact carry normalization with ``folds`` top-carry rho-folds, chains
    interleaved across the independent limb lists.

    Each fold is one exact sequential carry pass whose final carry c is
    multiplied into the static rho limbs and added back (c * rho_l <= 2^12 *
    carry bound — int32-safe for every statically-checked site).  A closing
    plain pass (top carry provably zero by ``_fold_count``) restores the
    canonical <= 2^12 limb invariant.
    """
    n = len(lists)
    L = len(rho_limbs)
    for _ in range(folds):
        outs = [[] for _ in range(n)]
        carries = [None] * n
        for k in range(L):
            for e in range(n):
                v = lists[e][k]
                if carries[e] is not None:
                    v = v + carries[e]
                outs[e].append(v & LIMB_MASK)
                carries[e] = v >> LIMB_BITS
        lists = [
            [
                outs[e][k] + carries[e] * rho_limbs[k] if rho_limbs[k] else outs[e][k]
                for k in range(L)
            ]
            for e in range(n)
        ]
    return _norm1_multi(lists)


def _row_sums(mat) -> int:
    return max(sum(row) for row in mat)


def _p2_kernel(ext_ref, int_ref, state_ref, out_ref, *, cfg, lane_streams):
    fs = cfg.field
    L = fs.nlimbs
    t = cfg.t
    ns = lane_streams
    fc = mont.field_consts(fs)
    p_limbs = fc["p_tuple"]
    n0inv = int(fc["n0inv"])
    p = fs.modulus
    R = fs.r
    rho = R % p
    rho_limbs = tuple(int(v) for v in fs.int_to_limbs(rho))
    one_mont = tuple(int(v) for v in fs.int_to_limbs(fs.r_mod_p))
    mat_e = cfg.mat_e
    dm1 = [(d - 1) % p for d in cfg.mat_i_diag]
    diag_small = all(v < SMALL_DIAG_LIMIT for v in dm1)
    if not diag_small:
        dm1_mont = [tuple(int(v) for v in fs.int_to_mont_limbs(d)) for d in dm1]
    half = cfg.full_rounds // 2

    # --- static fold counts per normalization site (exact value bounds) ---
    B12 = 1 << LIMB_BITS
    d_ext = _row_sums(mat_e) * B12  # deferred M_E output limbs
    if diag_small:
        d_int = (max(dm1) + t) * B12  # sigma + dm1*x deferred limbs
    else:
        d_int = (1 + t) * B12  # sigma + canonical REDC output
    # constant-add on top of a deferred linear layer (worst of the two phases)
    d_rc = max(d_ext, d_int) + B12
    folds_rc = _fold_count(R, rho, _limbs_vmax(R, d_rc))
    # S-box REDC tail: inputs < R (post-fold canonical), T < R^2, out < R + p.
    folds_redc = _fold_count(R, rho, R + p + 1)
    sbox_norm = functools.partial(
        _fold_norm_multi, rho_limbs=rho_limbs, folds=folds_redc
    )

    st4_init = state_ref[:]
    S = st4_init.shape[2]
    h = S // ns

    def unpack_streams(st4):
        return [
            [[st4[e, l, s * h : (s + 1) * h] for l in range(L)] for e in range(t)]
            for s in range(ns)
        ]

    def pack_streams(sts):
        return jnp.stack(
            [
                jnp.stack(
                    [
                        jnp.concatenate([sts[s][e][l] for s in range(ns)], axis=0)
                        for l in range(L)
                    ]
                )
                for e in range(t)
            ]
        )

    def fold_norm_all(sts):
        flat = [sts[s][e] for s in range(ns) for e in range(t)]
        normed = _fold_norm_multi(flat, rho_limbs, folds_rc)
        for s in range(ns):
            for e in range(t):
                sts[s][e] = normed[s * t + e]

    def sbox_elem(sts, e):
        outs = _pow_alpha_multi(
            L,
            [sts[s][e] for s in range(ns)],
            cfg.alpha,
            p_limbs,
            n0inv,
            final_norm=sbox_norm,
        )
        for s in range(ns):
            sts[s][e] = outs[s]

    def apply_mat_e(sts):
        """out_i = sum_j e_ij * x_j — plain-int scaling, left deferred
        (limbs <= row_sum * 2^12); folded by the next constant-add norm."""
        for s in range(ns):
            xs = sts[s]
            new = []
            for i in range(t):
                acc = None
                for j in range(t):
                    c = mat_e[i][j]
                    if c == 0:
                        continue
                    term = xs[j] if c == 1 else [c * v for v in xs[j]]
                    acc = term if acc is None else [a + b for a, b in zip(acc, term)]
                new.append(acc)
            sts[s] = new

    def external_round(r, st4):
        sts = unpack_streams(st4)
        for s in range(ns):
            for e in range(t):
                sts[s][e] = [
                    sts[s][e][l] + ext_ref[r, e * L + l] for l in range(L)
                ]
        fold_norm_all(sts)
        for e in range(t):
            sbox_elem(sts, e)
        apply_mat_e(sts)
        return pack_streams(sts)

    def internal_round(r, st4):
        sts = unpack_streams(st4)
        # Constant-add on element 0 only; the fold-norm clears the previous
        # round's deferred linear-layer carries for ALL elements.
        for s in range(ns):
            sts[s][0] = [sts[s][0][l] + int_ref[r, l] for l in range(L)]
        fold_norm_all(sts)
        sbox_elem(sts, 0)
        for s in range(ns):
            xs = sts[s]
            sigma = list(xs[0])
            for j in range(1, t):
                sigma = [a + b for a, b in zip(sigma, xs[j])]  # <= t * 2^12
            sts[s] = (xs, sigma)
        if diag_small:
            for s in range(ns):
                xs, sigma = sts[s]
                new = []
                for i in range(t):
                    c = dm1[i]
                    if c == 0:
                        new.append(sigma)
                    elif c == 1:
                        new.append([a + b for a, b in zip(sigma, xs[i])])
                    else:
                        new.append(
                            [a + c * b for a, b in zip(sigma, xs[i])]
                        )
                sts[s] = new  # deferred limbs <= (max dm1 + t) * 2^12
        else:
            # One constant-operand REDC per element (canonical output, value
            # < 2p since x < R and dm1_mont < p), chains interleaved across
            # (stream, element); sigma is added back deferred.
            cols_list = []
            for s in range(ns):
                xs, _ = sts[s]
                for i in range(t):
                    cols_list.append(_mul_cols(L, xs[i], dm1_mont[i]))
            reduced = _redc_multi(L, cols_list, p_limbs, n0inv)
            for s in range(ns):
                _, sigma = sts[s]
                sts[s] = [
                    [a + b for a, b in zip(reduced[s * t + i], sigma)]
                    for i in range(t)
                ]
        return pack_streams(sts)

    st4 = st4_init
    # Initial linear layer: sponge-invariant inputs (canonical limbs, < 2p);
    # output left deferred for the first external round's constant-add norm.
    sts = unpack_streams(st4)
    apply_mat_e(sts)
    st4 = pack_streams(sts)

    st4 = jax.lax.fori_loop(0, half, external_round, st4)
    st4 = jax.lax.fori_loop(0, cfg.partial_rounds, internal_round, st4)
    st4 = jax.lax.fori_loop(half, cfg.full_rounds, external_round, st4)

    # Closing reduction: clear the deferred linear layer, then Montgomery-
    # multiply by 1 so outputs satisfy the framework-wide < 2p invariant
    # (x < R, one_mont < p => REDC out < R*p/R + p = 2p).
    sts = unpack_streams(st4)
    fold_norm_all(sts)
    cols_list = [
        _mul_cols(L, sts[s][e], one_mont) for s in range(ns) for e in range(t)
    ]
    reduced = _redc_multi(L, cols_list, p_limbs, n0inv)
    for s in range(ns):
        for e in range(t):
            sts[s][e] = reduced[s * t + e]
    out_ref[:] = pack_streams(sts)


@functools.lru_cache(maxsize=None)
def p2_permute_fn(
    cfg: Poseidon2Config,
    interpret: bool = False,
    sublanes: int = SUBLANES,
    lane_streams: int | None = None,
):
    """Jitted Poseidon2 permutation: (t, L, B) -> (t, L, B), B % (sublanes*128) == 0.

    Lane-stream interleaving follows the measured-fastest Poseidon shape
    (2 independent (8,128) sub-tiles in lockstep, docs/DESIGN.md §6).
    """
    if cfg.field.limb_bits != 12:
        # This family's kernel bound analysis (fold counts, row-sum budgets,
        # quasi ranges) is derived for the 12-bit limb plan; the 13-bit plan
        # (DESIGN S25) is currently wired through the Poseidon CIOS kernel
        # only.  Fail loudly rather than mask with a wrong limb width.
        raise ValueError(
            f"{cfg.field.name}: limb_bits={cfg.field.limb_bits} is not "
            "supported by this family kernel (12-bit plan only)"
        )
    if lane_streams is None:
        lane_streams = 2 if sublanes % 16 == 0 else 1
    if lane_streams > 1 and sublanes % (8 * lane_streams) != 0:
        raise ValueError(
            f"lane_streams={lane_streams} needs sublanes divisible by "
            f"{8 * lane_streams} (got {sublanes})"
        )
    fs = cfg.field
    L = fs.nlimbs
    t = cfg.t
    tile_lanes = sublanes * 128
    # int32 budget of the deferred linear layers + fold products:
    # limbs <= (row_sum + 1) * 2^12 and fold terms <= carry * 2^12 — both
    # far below 2^31 for every defined matrix; guard anyway.
    if (_row_sums(cfg.mat_e) + t + SMALL_DIAG_LIMIT + 2) * (1 << LIMB_BITS) >= (
        1 << 30
    ):
        raise ValueError(f"mat_e row sums too large for the deferred-carry path")

    ext_np = np.stack(
        [
            np.concatenate([fs.int_to_mont_limbs(c) for c in row])
            for row in cfg.external_rc
        ]
    ).astype(np.int32)  # (R_F, t*L)
    if cfg.partial_rounds:
        int_np = np.stack(
            [fs.int_to_mont_limbs(c) for c in cfg.internal_rc]
        ).astype(np.int32)  # (R_P, L)
    else:
        int_np = np.zeros((1, L), dtype=np.int32)

    kernel = functools.partial(_p2_kernel, cfg=cfg, lane_streams=lane_streams)

    @jax.jit
    def run(state):
        B = state.shape[-1]
        if B % tile_lanes != 0:
            raise ValueError(f"batch {B} must be a multiple of {tile_lanes}")
        st4 = state.reshape(t, L, B // 128, 128)
        grid = (B // tile_lanes,)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(st4.shape, jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (t, L, sublanes, 128),
                    lambda i: (0, 0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (t, L, sublanes, 128), lambda i: (0, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            cost_estimate=pl.CostEstimate(
                flops=(cfg.full_rounds * t + cfg.partial_rounds)
                * 12 * 2 * L * L * tile_lanes,
                bytes_accessed=2 * t * L * tile_lanes * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(jnp.asarray(ext_np), jnp.asarray(int_np), st4)
        return out.reshape(t, L, B)

    return run
