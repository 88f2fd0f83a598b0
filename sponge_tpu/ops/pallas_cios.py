"""Fully-unrolled CIOS Pallas kernel for the Poseidon permutation (fast tier).

Second-generation kernel, ~1.5-2x the arithmetic efficiency of
``pallas_permute`` (the readable reference kernel):

* **Interleaved CIOS Montgomery multiply** instead of the non-interleaved
  3-product REDC: ~2L^2 multiplies per field-mul instead of ~3L^2, and zero
  pad/concat data movement — limbs live as *python lists of 2-D tiles*, so every
  shift is just list indexing resolved at trace time.
* **Lazy MDS accumulation**: the t products of one MDS output row accumulate in
  redundant columns and share a single Montgomery reduction (bounds: 3L partial
  products of <= 2^24 plus REDC additions stay < 2^31 — int32-safe).
* **Exact one-pass sequential carry normalization** (the carry chain is resolved
  limb-to-limb within one pass; cheaper than the multi-pass vectorized form and
  keeps every multiplier input canonical <= 0xfff).
* Batch lanes occupy BOTH sublanes and lanes — tiles are (t, TBS, 128) — so the
  VPU runs at full occupancy regardless of t and L.

Constants (p limbs, N'0 = -p^{-1} mod 2^12, Montgomery-form MDS limbs) are baked
in as python-int scalar immediates; only the round constants (dynamically indexed
by round) come in via SMEM.

Round schedule mirrors /root/reference/src/poseidon/mod.rs:95-118; bit-exactness
vs the oracle is enforced in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import LIMB_BITS, LIMB_MASK
from ..poseidon.config import PoseidonConfig
from . import montgomery as mont

# Sublane-dimension of a batch tile; one tile covers SUBLANES*128 sponge lanes.
# Swept on v5e at B=2^20: 8 -> 5.58, 16 -> 5.96, 32 -> 4.68 M perms/s (VMEM
# pressure wins above 16).
SUBLANES = 16
TILE_LANES = SUBLANES * 128


def _norm1(limbs, lb=LIMB_BITS):
    """Exact one-pass sequential carry normalization of a limb list.

    carry_k is the fully-propagated carry out of limb k-1, so outputs are
    canonical (< 2^lb) in a single pass; the carry out of the top limb is
    dropped (value-bound analysis: all in-kernel values stay < 4p << R, so
    the top carry is always zero).
    """
    mask = (1 << lb) - 1
    out = []
    carry = None
    for v in limbs:
        if carry is not None:
            v = v + carry
        out.append(v & mask)
        carry = v >> lb
    return out


def _relaxed_norm_multi(limbs_list, passes=2, lb=LIMB_BITS):
    """Chain-FREE epsilon-redundant normalization: ``passes`` parallel
    split-carry passes ``out[k] = (v[k] & mask) + (v[k-1] >> 12)``.

    Unlike ``_norm1`` (an L-step *sequential* carry chain), every limb here
    is computed independently — zero dependency chain — at the cost of a
    redundant output range: limbs <= 2^12 + 128 ("quasi-canonical") instead
    of < 2^12.  Exactness: the represented VALUE is preserved limb-for-limb
    (the top limb's high part is provably empty because every in-kernel
    value stays < 4.1p << 2^(12L), so v[L-1] < 2^12 + eps and nothing is
    dropped).  Bound book-keeping for the redundant range lives in
    ``_mds_groups(quasi=True)`` and the docstrings of the column builders:
    2 passes bring any REDC tail (< 2^31) to <= (2^12-1) + 129 = 4224; one
    pass suffices for add-sites whose input is <= 2^19 (ark adds, sparse
    column adds, grouped-MDS part sums) and lands <= 4095 + 128.
    """
    mask = (1 << lb) - 1
    outs = limbs_list
    for _ in range(passes):
        outs = [
            [
                (limbs[k] & mask) + (limbs[k - 1] >> lb if k else 0)
                for k in range(len(limbs))
            ]
            for limbs in outs
        ]
    return outs


def _relaxed_norm(limbs, passes=2, lb=LIMB_BITS):
    """Single-list form of ``_relaxed_norm_multi``."""
    return _relaxed_norm_multi([limbs], passes, lb)[0]


def _redc(L, cols, p_limbs, n0inv, final_norm=None, lb=LIMB_BITS):
    """Interleaved-carry Montgomery reduction of a 2L redundant column list.

    Standard base-2^12 CIOS tail: per limb i, u = (true value at i) * N'0 mod
    2^12 makes column i divisible by 2^12; u*p is accumulated into the higher
    columns; the running carry c tracks the exact value flowing out of the
    reduced low limbs.  Result = columns L..2L-1 plus c at position L.
    ``final_norm`` overrides the closing normalization (default the exact
    sequential ``_norm1``; the relaxed kernel substitutes the chain-free
    ``_relaxed_norm``).
    """
    mask = (1 << lb) - 1
    c = None
    for i in range(L):
        v = cols[i] if c is None else cols[i] + c
        u = (v * n0inv) & mask
        w = v + u * p_limbs[0]
        c = w >> lb
        for k in range(1, L):
            pk = p_limbs[k]
            if pk:
                cols[i + k] = cols[i + k] + u * pk
    res = list(cols[L : 2 * L])
    res[0] = res[0] + c
    if final_norm is not None:
        return final_norm(res)
    return _norm1(res, lb)


def _mul_cols(L, a, b):
    """Schoolbook columns of a*b (2L redundant columns, top column zero)."""
    cols = [None] * (2 * L)
    for j in range(L):
        bj = b[j]
        for i in range(L):
            term = a[i] * bj
            cols[i + j] = term if cols[i + j] is None else cols[i + j] + term
    cols[2 * L - 1] = jnp.zeros_like(a[0])  # i+j <= 2L-2: top column is empty
    return cols


def _cios_mul(L, a, b, p_limbs, n0inv, final_norm=None, lb=LIMB_BITS):
    """Montgomery product of two limb lists (schoolbook + interleaved REDC)."""
    return _redc(L, _mul_cols(L, a, b), p_limbs, n0inv, final_norm, lb)


def _cios_mul_const(L, a, b_ints, p_limbs, n0inv, lb=LIMB_BITS):
    """Montgomery product where ``b`` is a static python-int limb tuple."""
    cols = [None] * (2 * L)
    for j in range(L):
        bj = b_ints[j]
        if bj == 0:
            continue
        for i in range(L):
            term = a[i] * bj
            cols[i + j] = term if cols[i + j] is None else cols[i + j] + term
    for k in range(2 * L):
        if cols[k] is None:
            cols[k] = jnp.zeros_like(a[0])
    return _redc(L, cols, p_limbs, n0inv, lb=lb)


def _sqr_cols(L, a):
    """Schoolbook columns of a^2, exploiting product symmetry: a_i*a_j (i<j)
    counted once against a pre-doubled operand — ~L^2/2 multiplies.

    Bounds: doubled limbs <= 2^13, so off-diagonal products are <= 2^25 with
    <= ceil(L/2) addends per column plus the diagonal and REDC terms — still
    comfortably < 2^31.
    """
    a2 = [ai + ai for ai in a]  # 2*a_i <= 2^13
    cols = [None] * (2 * L)
    for i in range(L):
        # diagonal a_i^2
        d = a[i] * a[i]
        k = 2 * i
        cols[k] = d if cols[k] is None else cols[k] + d
        # off-diagonal pairs counted once with the doubled operand
        for j in range(i + 1, L):
            term = a2[i] * a[j]
            k = i + j
            cols[k] = term if cols[k] is None else cols[k] + term
    cols[2 * L - 1] = jnp.zeros_like(a[0])
    return cols


def _cios_sqr(L, a, p_limbs, n0inv, final_norm=None, lb=LIMB_BITS):
    """Montgomery square via the symmetric column builder + interleaved REDC."""
    return _redc(L, _sqr_cols(L, a), p_limbs, n0inv, final_norm, lb)


# ---------------------------------------------------------------------------
# Software-pipelined (chain-interleaved) variants.
#
# A single REDC is an inherently serial base-2^12 carry chain: L dependent
# steps, each a handful of VPU ops.  One Poseidon round, however, contains
# several REDCs with NO data dependence between them (the t S-box chains of a
# full round; the t MDS output rows; the sparse-matrix products of an
# optimized partial round).  The *_multi functions below emit those
# independent chains with their steps interleaved in trace order, so an
# in-order scheduler overlaps chain k's carry latency with chain k±1's work —
# trace-level software pipelining.  The arithmetic is identical to the scalar
# versions (same columns, same reductions); only emission order differs.
# ---------------------------------------------------------------------------


def _norm1_multi(limbs_list, lb=LIMB_BITS):
    """_norm1 over several limb lists with interleaved carry steps."""
    mask = (1 << lb) - 1
    n = len(limbs_list)
    L = len(limbs_list[0])
    outs = [[] for _ in range(n)]
    carries = [None] * n
    for k in range(L):
        for e in range(n):
            v = limbs_list[e][k]
            if carries[e] is not None:
                v = v + carries[e]
            outs[e].append(v & mask)
            carries[e] = v >> lb
    return outs


def _redc_multi(L, cols_list, p_limbs, n0inv, final_norm=None, lb=LIMB_BITS):
    """_redc over several independent column lists, steps interleaved.

    ``final_norm`` overrides the closing carry normalization (default
    ``_norm1_multi``); used by the Poseidon2 kernel to substitute a
    top-carry-folding norm for inputs whose values may reach the Montgomery
    radix R (ops/pallas_p2.py)."""
    mask = (1 << lb) - 1
    n = len(cols_list)
    cs = [None] * n
    for i in range(L):
        for e in range(n):
            cols = cols_list[e]
            v = cols[i] if cs[e] is None else cols[i] + cs[e]
            u = (v * n0inv) & mask
            w = v + u * p_limbs[0]
            cs[e] = w >> lb
            for k in range(1, L):
                pk = p_limbs[k]
                if pk:
                    cols[i + k] = cols[i + k] + u * pk
    res_list = []
    for e in range(n):
        res = list(cols_list[e][L : 2 * L])
        res[0] = res[0] + cs[e]
        res_list.append(res)
    if final_norm is not None:
        return final_norm(res_list)
    return _norm1_multi(res_list, lb)


def _pow_alpha_multi(L, xs, alpha, p_limbs, n0inv, final_norm=None, lb=LIMB_BITS):
    """x^alpha for several independent elements, square/multiply steps emitted
    in lockstep so the per-step REDC chains interleave.  ``final_norm`` is
    threaded to every intermediate REDC (see ``_redc_multi``)."""
    bits = bin(alpha)[2:]
    accs = list(xs)
    for bit in bits[1:]:
        accs = _redc_multi(
            L, [_sqr_cols(L, a) for a in accs], p_limbs, n0inv, final_norm, lb
        )
        if bit == "1":
            accs = _redc_multi(
                L,
                [_mul_cols(L, a, x) for a, x in zip(accs, xs)],
                p_limbs,
                n0inv,
                final_norm,
                lb,
            )
    return accs


def _pow_alpha(L, x, alpha, p_limbs, n0inv, final_norm=None, lb=LIMB_BITS):
    """x^alpha by MSB-first square-and-multiply over limb lists."""
    bits = bin(alpha)[2:]
    acc = x
    for bit in bits[1:]:
        acc = _cios_sqr(L, acc, p_limbs, n0inv, final_norm, lb)
        if bit == "1":
            acc = _cios_mul(L, acc, x, p_limbs, n0inv, final_norm, lb)
    return acc


def _row_dot_cols(L, elems, coeffs, js):
    """Schoolbook columns of sum_{e in js} coeffs[e] * elems[e] (one lazy
    accumulation group of a variable-coefficient dot product)."""
    cols = [None] * (2 * L)
    for e in js:
        xe = elems[e]
        ce = coeffs[e]
        for l2 in range(L):
            c = ce[l2]
            for l1 in range(L):
                term = xe[l1] * c
                k = l1 + l2
                cols[k] = term if cols[k] is None else cols[k] + term
    for k in range(2 * L):
        if cols[k] is None:
            cols[k] = jnp.zeros_like(elems[0][0])
    return cols


def _sparse_apply(
    L, t, elems, row0, col0, p_limbs, n0inv, groups=None, final_norm=None,
    sum_norm=None, lb=LIMB_BITS,
):
    """Apply one optimized-partial-round sparse matrix to limb-list elements.

    ``row0``: t limb vectors (lists of scalars — SMEM loads in-kernel, ints in
    tests); ``col0``: t-1 limb vectors.  out[0] = <row0, elems> with lazy column
    accumulation per group (int32 bound: see ``_mds_groups``); out[i] =
    REDC(col0[i-1] * elems[0]) + elems[i] (limbs <= 2^13, renormalized by the
    next round's constant-add norm).
    """
    groups = groups or _mds_groups(L, t, lb=lb)
    # out0 = sum_e row0[e] * elems[e]
    parts = [
        _redc(L, _row_dot_cols(L, elems, row0, js), p_limbs, n0inv, final_norm, lb)
        for js in groups
    ]
    if len(parts) == 1:
        out = [parts[0]]
    elif sum_norm is not None:
        out = [sum_norm(_sum_limbs(parts))]
    else:
        out = [_norm1(_sum_limbs(parts), lb)]
    # out[i] = col0[i-1] * x0 + x_i
    x0 = elems[0]
    for i in range(1, t):
        prod = _redc(
            L, _row_dot_cols(L, [x0], [col0[i - 1]], [0]), p_limbs, n0inv,
            final_norm, lb,
        )
        out.append([a + b for a, b in zip(prod, elems[i])])  # limbs <= 2^(lb+1)
    return out


QUASI_LIMB_MAX = (1 << LIMB_BITS) + 128  # 2-pass _relaxed_norm output bound


def quasi_limb_max(lb=LIMB_BITS, unsigned=False):
    """Exact 2-pass ``_relaxed_norm`` output bound for limb width ``lb``.

    Inputs are REDC tails below the accumulator budget (2^31 signed int32 /
    2^32 unsigned uint32 — the 13-bit plan, DESIGN §25); two split-carry
    passes bring any such value to (2^lb - 1) + second-pass carry.  At the
    12-bit/int32 plan this gives 4223 — one tighter than the conservative
    historical constant QUASI_LIMB_MAX = 4224 (same grouping everywhere).
    """
    budget = (1 << 32) if unsigned else (1 << 31)
    pass1 = ((1 << lb) - 1) + ((budget - 1) >> lb)
    return ((1 << lb) - 1) + (pass1 >> lb)

# ---------------------------------------------------------------------------
# MXU MDS path (docs/DESIGN.md §24).
#
# The MDS limb-convolution multiplies the state by CONSTANT field elements, so
# it is one fixed linear map over the state's limbs.  Expressed at 6-bit
# sub-limb granularity it rides the MXU exactly in bf16:
#   * each (quasi-)canonical 12/13-bit limb splits into two planes
#     (v & 63, v >> 6), values <= 66 — bf16-exact (integers <= 256);
#   * each constant MDS limb splits into two 6-bit pieces folded into the
#     weight matrix W[(j, in_pos), (i, out_pos)] = piece of mds[i][j] at
#     (out_pos - in_pos), entries <= 63 — bf16-exact;
#   * f32 accumulation over K = t*2L planes is exact: sums <= K*66*63
#     (< 2^21 even at t = 9) << 2^24, the f32 integer-exact bound;
#   * the f32 output positions rebin to the 12-bit REDC column domain as
#     cols[k] = pos[2k] + (pos[2k+1] << 6) <= 2^24+, and with the (L-1)
#     interleaved REDC addends (< 2^24 each) stay int32-safe — so the MXU
#     output feeds the existing _redc_multi unchanged, at ANY t, with no
#     accumulation grouping.
# ---------------------------------------------------------------------------


def _mds_mxu_weights(L, t, mds_ints) -> np.ndarray:
    """(t*2L, t*(4L-1)) float32 weight matrix of the MDS limb-convolution at
    6-bit granularity (cast to bf16 at the pallas_call boundary)."""
    P = 2 * L
    npos = 4 * L - 1
    w = np.zeros((t * P, t * npos), dtype=np.float32)
    for i in range(t):
        for j in range(t):
            pieces = []
            for l in range(L):
                pieces.append(mds_ints[i][j][l] & 63)
                pieces.append(mds_ints[i][j][l] >> 6)
            for m in range(P):
                for q, piece in enumerate(pieces):
                    if piece:
                        w[j * P + m, i * npos + m + q] += piece
    return w


def _mds_mxu_cols(L, t, elems, w_ref):
    """REDC column lists of every MDS output row, with the limb-convolution
    computed on the MXU (see the block comment above).  ``elems[j][l]`` are
    2-D (sublane, lane) tiles; they stack along a NEW leading axis (a vreg-
    list concat, not a cross-lane relayout) and the dot_general contracts
    that axis with both tile dims free — Mosaic lowers the multi-free-dim
    form natively, so no reshape/relayout touches the data.  Returns t lists
    of 2L int32 column tiles, ready for ``_redc_multi`` (callers slice
    streams as needed)."""
    npos = 4 * L - 1
    planes = []
    for j in range(t):
        for l in range(L):
            v = elems[j][l]
            planes.append(v & 63)
            planes.append(v >> 6)
    x = jnp.stack(planes).astype(jnp.bfloat16)  # (t*2L, sub, lane)
    pos = jax.lax.dot_general(
        w_ref[:], x, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # (t*npos, sub, lane), integer-exact
    cols_list = []
    for i in range(t):
        base = i * npos
        cols = []
        for k in range(2 * L):
            v = pos[base + 2 * k]
            if 2 * k + 1 < npos:
                v = v + (pos[base + 2 * k + 1] << 6)
            cols.append(v)
        cols_list.append(cols)
    return cols_list


def _mds_apply_mxu(L, t, elems, w_ref, p_limbs, n0inv, final_norm=None):
    """new[i] = sum_j mds[i][j] * elems[j]: MXU limb-convolution + the t
    output REDC chains interleaved on the VPU."""
    return _redc_multi(
        L, _mds_mxu_cols(L, t, elems, w_ref), p_limbs, n0inv, final_norm
    )


def _mds_groups(L, t, max_group=None, quasi=False, lb=LIMB_BITS, unsigned=False):
    """Partition of the MDS dot indices 0..t-1 into lazy-accumulation groups.

    A shared REDC over g accumulated products has columns holding up to
    g*L schoolbook addends plus (L-1) REDC addends, each < (2^lb - 1)^2;
    accumulator safety therefore requires (g*L + L - 1) * (2^lb - 1)^2 to
    fit the budget — 2^31 for the signed int32 plan, 2^32 for the unsigned
    uint32 plan (13-bit limbs, DESIGN §25).  For t <= g (every config with
    t <= 4 at L = 22) this is a single group and the trace is identical to
    the ungrouped kernel; wider dots split into ceil(t/g) groups whose
    reduced outputs are summed (canonical limbs, <= ceil(t/g) * 2^lb) and
    renormalized.  ``max_group`` forces a smaller group purely so CI can
    exercise the grouped path at tiny L.

    ``quasi=True`` tightens the budget for the relaxed-norm kernel, whose
    element limbs are <= quasi_limb_max(lb, unsigned) instead of < 2^lb:
    schoolbook addends are then <= qmax * cmax each (constants stay
    canonical), so g*L * qmax * cmax + (L-1) * cmax^2 < budget (at L = 22,
    lb = 12 this still yields g = 4 — identical grouping to the exact
    kernel for every production config; at L = 20, lb = 13 both modes
    yield g = 2).
    """
    budget = (1 << 32) if unsigned else (1 << 31)
    cmax = (1 << lb) - 1
    if quasi:
        qmax = quasi_limb_max(lb, unsigned)
        num = budget - (L - 1) * cmax * cmax - (1 << 24)  # running-carry slack
        g = num // (qmax * cmax) // L
    else:
        g = (budget // (cmax * cmax) - L) // L
    if max_group is not None:
        g = min(g, max_group)
    if g < 1:
        raise ValueError(f"L={L} too wide for the lazy-REDC CIOS kernel")
    return [tuple(range(j0, min(j0 + g, t))) for j0 in range(0, t, g)]


def _sum_limbs(parts):
    """Limb-wise sum of canonical limb lists (bound: len(parts) * 2^12)."""
    out = parts[0]
    for p in parts[1:]:
        out = [a + b for a, b in zip(out, p)]
    return out


# ---------------------------------------------------------------------------
# Value-overflow protection for the optimized-partial phase (DESIGN §25).
#
# The sparse decomposition never Montgomery-reduces elements 1..t-1 during the
# partial phase: each round ADDS a reduced column product plus a round
# constant, so those elements' VALUES grow by up to ~2p per partial round.
# The limb representation holds values < R, and the carry normalizations drop
# the top carry on the proof that values stay below R — sound at the 12-bit
# plans (e.g. BLS: ~63p worst-case vs R = 564p; Mersenne31: ~29p vs 32p,
# deterministically safe), but VIOLATED at the 13-bit plan's reduced headroom
# (R = 2^260 ~ 35p, ~31 partial rounds): round-5 measured data-dependent
# parity failures on exactly this path (25/64 random lanes at one seed).
#
# The fix is a static worst-case value simulation at kernel-build time
# (_sparse_value_bound) and, when the bound approaches R, a TOP-LIMB RHO-FOLD
# after each sparse accumulation (_top_fold): c = top_limb >> lb is exactly
# the representation's overflow multiple of R (the lower limbs' quasi excess
# contributes < 2^-11 R), so replacing c*R by c*(R mod p) preserves the value
# mod p and brings the representation back under R.  Cost: ~2L+2 VPU ops per
# folded element per round (vs ~9L^2 for the round) — and the 12-bit plans
# simulate safe, so their traces are byte-identical with folds disabled.
# ---------------------------------------------------------------------------


def _sbox_value_bound(v, alpha, x):
    """Worst-case value (in units of p) of x^alpha via the kernel's chain;
    ``x`` = p/R.  Each REDC maps bound b -> b*input*x + 1 (result <= T/R + p)."""
    bits = bin(alpha)[2:]
    s = v
    for bit in bits[1:]:
        s = s * s * x + 1.0
        if bit == "1":
            s = s * v * x + 1.0
    return s


def _sparse_value_bound(cfg, n_groups):
    """Worst-case element value (units of p) reached during the optimized
    partial phase, by static simulation of the kernel's own schedule.

    Full-round phase: every element is REDC'd each round (self-reducing
    fixpoint ~1.5-3p).  Partial phase: elem0 is REDC'd per round via the
    row0 dot; elements 1..t-1 accumulate (col0-product REDC output + round
    constant) per round with NO reduction — the growing term this bound
    tracks.  Group sums add +1p per extra group (each group REDC result
    <= partialT/R + p)."""
    fs = cfg.field
    x = fs.modulus / fs.r
    G = n_groups
    v = 1.0  # canonical input
    for _ in range(cfg.full_rounds // 2):
        s = _sbox_value_bound(v + 1.0, cfg.alpha, x)
        v = cfg.t * s * x + G  # MDS row: T <= t*s*p, + p per group REDC
    # First partial round: ark + sbox0 only (no sparse apply yet).
    s0 = _sbox_value_bound(v + 1.0, cfg.alpha, x)
    v_rest = v
    vmax = v_rest
    for _ in range(cfg.partial_rounds - 1):
        x0 = s0 + 1.0  # post-ark elem0
        rest_in = v_rest + 1.0  # post-ark rest
        out0 = (x0 + (cfg.t - 1) * rest_in) * x + G
        v_rest = rest_in + (x0 * x + 1.0)  # += col0-product REDC output
        vmax = max(vmax, v_rest, out0)
        s0 = _sbox_value_bound(out0, cfg.alpha, x)
    return vmax


def _sparse_needs_fold(cfg, n_groups) -> bool:
    """True when the sparse-phase worst-case value can reach 98% of R."""
    fs = cfg.field
    return _sparse_value_bound(cfg, n_groups) >= 0.98 * fs.r / fs.modulus


def _top_fold_multi(limbs_list, rho_half_ints, lb):
    """Half-range top-limb rho-fold of several limb lists (block comment above).

    The fold must keep the top limb strictly below 2^lb at EVERY subsequent
    normalization site — the relaxed 1-pass norms truncate the top limb's
    high bits unconditionally — so it folds at bit (lb-1): c = top >> (lb-1),
    top &= 2^(lb-1)-1, then += c * rho_half with rho_half = (R/2) mod p
    (bit lb-1 of the top limb has weight R/2; substituting preserves the
    value mod p exactly).  Nonnegative limbs pin every representation's top
    limb to ~value / 2^(lb*(L-1)), so post-fold the value is <= ~0.62 R and
    the per-round growth (<= ~3p, i.e. <= 3*2^lb/(R/p) on the top limb, with
    R >= 16p guaranteed by FieldSpec) can never push the top limb back to
    2^lb before the next round's fold — no normalization site ever sees a
    non-empty top-limb high part, restoring the carry-drop soundness proof.
    c <= 4 here (inputs are sums of two quasi-canonical lists)."""
    half_mask = (1 << (lb - 1)) - 1
    outs = []
    for limbs in limbs_list:
        c = limbs[-1] >> (lb - 1)
        out = [
            limbs[k] + c * rho_half_ints[k] if rho_half_ints[k] else limbs[k]
            for k in range(len(limbs) - 1)
        ]
        top = limbs[-1] & half_mask
        if rho_half_ints[-1]:
            top = top + c * rho_half_ints[-1]
        out.append(top)
        outs.append(out)
    return outs


def _mds_apply(
    L, t, elems, mds_ints, p_limbs, n0inv, groups=None, final_norm=None,
    sum_norm=None, lb=LIMB_BITS,
):
    """new[i] = sum_j mds[i][j] * elems[j], with lazy column accumulation.

    Products within one group share a single REDC (bound analysis in
    ``_mds_groups``); multi-group rows sum their reduced parts and
    renormalize, so the output is always canonical (quasi-canonical in the
    relaxed kernel).
    """
    groups = groups or _mds_groups(L, t, lb=lb)
    out = []
    for i in range(t):
        parts = [
            _redc(
                L, _mds_row_cols(L, t, elems, mds_ints[i], js), p_limbs,
                n0inv, final_norm, lb,
            )
            for js in groups
        ]
        if len(parts) == 1:
            out.append(parts[0])
        elif sum_norm is not None:
            out.append(sum_norm(_sum_limbs(parts)))
        else:
            out.append(_norm1(_sum_limbs(parts), lb))
    return out


def _mds_row_cols(L, t, elems, row_ints, js=None):
    """Schoolbook columns of one lazy-accumulated MDS output row (optionally
    restricted to the dot indices ``js`` — one accumulation group)."""
    cols = [None] * (2 * L)
    for j in js if js is not None else range(t):
        ej = elems[j]
        cij = row_ints[j]
        for l2 in range(L):
            c = cij[l2]
            if c == 0:
                continue
            for l1 in range(L):
                term = ej[l1] * c
                k = l1 + l2
                cols[k] = term if cols[k] is None else cols[k] + term
    for k in range(2 * L):
        if cols[k] is None:
            cols[k] = jnp.zeros_like(elems[0][0])
    return cols


def _mds_apply_multi(
    L, t, elems, mds_ints, p_limbs, n0inv, groups=None, final_norm=None,
    sum_norm=None, lb=LIMB_BITS,
):
    """_mds_apply with the t output-row REDC chains interleaved."""
    groups = groups or _mds_groups(L, t, lb=lb)
    parts = [[] for _ in range(t)]
    for js in groups:
        red = _redc_multi(
            L,
            [_mds_row_cols(L, t, elems, mds_ints[i], js) for i in range(t)],
            p_limbs,
            n0inv,
            final_norm,
            lb,
        )
        for i in range(t):
            parts[i].append(red[i])
    if len(groups) == 1:
        return [parts[i][0] for i in range(t)]
    sums = [_sum_limbs(parts[i]) for i in range(t)]
    if sum_norm is not None:
        return sum_norm(sums)
    return _norm1_multi(sums, lb)


def _sparse_cols_list(L, t, elems, row0, col0, groups=None, lb=LIMB_BITS):
    """Column lists of one optimized-partial-round sparse apply: the row0-dot
    accumulation groups (indices 0..G-1, see ``_mds_groups``) followed by the
    t-1 column products col0[i-1]*x0.  All entries are mutually independent."""
    groups = groups or _mds_groups(L, t, lb=lb)
    cols_list = [_row_dot_cols(L, elems, row0, js) for js in groups]
    # col0[i-1] * x0 products.
    x0 = elems[0]
    for i in range(1, t):
        ci = col0[i - 1]
        cols = [None] * (2 * L)
        for l2 in range(L):
            c = ci[l2]
            for l1 in range(L):
                term = x0[l1] * c
                k = l1 + l2
                cols[k] = term if cols[k] is None else cols[k] + term
        for k in range(2 * L):
            if cols[k] is None:
                cols[k] = jnp.zeros_like(x0[0])
        cols_list.append(cols)
    return cols_list


def _sparse_combine(L, t, reduced, elems, n_groups, sum_norm=None):
    """Recombine the _redc_multi outputs of a _sparse_cols_list: sum (and, if
    grouped, renormalize) the row0-dot parts, add elems into the column
    products (limbs <= 2^13, renormalized by the next round's constant-add).

    ``sum_norm`` is a MULTI-list normalizer (``_norm1_multi`` /
    ``_relaxed_norm_multi``): this helper is only reached from
    ``_sparse_apply_multi``, i.e. the chain-interleaved (pipelined) emission,
    whose callers always thread the multi variant.  (Round-2 regression: the
    relaxed-norm commit applied the multi normalizer to a bare limb list here,
    crashing every pipelined+grouped trace — see tests
    ``test_cios_kernel_body_grouped_mds[*-pipelined]`` and the config fuzzer.)
    """
    if n_groups == 1:
        out0 = reduced[0]
    else:
        out0 = (sum_norm or _norm1_multi)([_sum_limbs(reduced[:n_groups])])[0]
    out = [out0]
    for i in range(1, t):
        out.append(
            [a + b for a, b in zip(reduced[n_groups + i - 1], elems[i])]
        )
    return out


def _sparse_apply_multi(
    L, t, elems, row0, col0, p_limbs, n0inv, groups=None, final_norm=None,
    sum_norm=None, lb=LIMB_BITS,
):
    """_sparse_apply with the row0-dot REDC(s) and the t-1 column-product REDCs
    interleaved (they are mutually independent)."""
    groups = groups or _mds_groups(L, t, lb=lb)
    reduced = _redc_multi(
        L, _sparse_cols_list(L, t, elems, row0, col0, groups), p_limbs, n0inv,
        final_norm, lb,
    )
    return _sparse_combine(
        L, t, reduced, elems, len(groups),
        sum_norm or functools.partial(_norm1_multi, lb=lb),
    )


def _permute_kernel_streams(
    ark_ref, popt_ref, state_ref, out_ref, *, cfg, optimized, lane_streams,
    mds_group=None, relaxed=False, wide_interleave=False, mdsw_ref=None,
):
    """Lane-stream-interleaved kernel: the batch tile is split into
    ``lane_streams`` independent sub-tiles along the sublane axis, advanced in
    lockstep with every REDC/carry chain interleaved across the streams.

    Unlike element-level interleaving (``pipelined=True``), this provides a
    UNIFORM independence depth through the whole round schedule — including the
    partial-round single-element S-box chains, which dominate the schedule and
    have no element-level parallelism to exploit.  Motivated by
    bench/latency_probe.py: a dependent modmul chain on one (8,128) tile runs
    1.75x slower than two interleaved independent chains.

    ``relaxed=True`` substitutes the chain-free epsilon-redundant
    normalization (``_relaxed_norm_multi``) at every REDC tail and add site,
    keeping element limbs quasi-canonical (<= 2^12 + 128) between rounds and
    canonicalizing exactly once at kernel exit — the sequential ``_norm1``
    carry chains disappear from the round schedule entirely.

    ``wide_interleave=True`` widens chain interleaving from ``lane_streams``
    to every independent chain available at each schedule point: all t*ns
    full-round S-box chains in one ``_pow_alpha_multi``, all t*ns MDS output
    rows per accumulation group in one ``_redc_multi``, and all
    (G + t - 1)*ns sparse-apply column lists of an optimized partial round
    in one ``_redc_multi`` (arithmetic identical — same columns, same
    reductions; only emission order changes).  Motivated by the round-3
    latency accounting (bench/latency_accounting_probe.py, DESIGN.md §21):
    92% of the 145 ns/perm is REDC chains interleaved only 2-way where 6-8
    independent chains exist.  The counterweight is register pressure /
    VMEM spills — measured verdict in DESIGN.md §21.
    """
    fs = cfg.field
    L = fs.nlimbs
    t = cfg.t
    lb = fs.limb_bits
    unsigned = fs.unsigned_accum
    ns = lane_streams
    fc = mont.field_consts(fs)
    p_limbs = fc["p_tuple"]
    n0inv = int(fc["n0inv"])
    mds_ints = tuple(
        tuple(tuple(int(v) for v in fs.int_to_mont_limbs(c)) for c in row)
        for row in cfg.mds
    )
    groups = _mds_groups(L, t, mds_group, quasi=relaxed, lb=lb, unsigned=unsigned)
    G = len(groups)
    # Sparse-phase value-overflow protection (block comment at _top_fold_multi).
    needs_fold = optimized and _sparse_needs_fold(cfg, G)
    rho_half_ints = tuple(
        int(v) for v in fs.int_to_limbs((fs.r >> 1) % fs.modulus)
    )
    if relaxed:
        tail_norm_multi = functools.partial(_relaxed_norm_multi, passes=2, lb=lb)
        small_norm_multi = functools.partial(_relaxed_norm_multi, passes=1, lb=lb)
    else:
        tail_norm_multi = None  # helpers default to the exact _norm1_multi
        small_norm_multi = functools.partial(_norm1_multi, lb=lb)

    st4_init = state_ref[:]
    if unsigned:
        # The 13-bit plan's worst column sums exceed 2^31 but stay < 2^32:
        # compute the whole round schedule in uint32 (logical shifts; same
        # measured VPU issue rate — bench/uint32_probe.py, DESIGN §25).
        st4_init = st4_init.astype(jnp.uint32)
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
                        jnp.concatenate(
                            [sts[s][e][l] for s in range(ns)], axis=0
                        )
                        for l in range(L)
                    ]
                )
                for e in range(t)
            ]
        )

    def ark_norm_streams(sts, r, ref):
        for e in range(t):
            added = [
                [sts[s][e][l] + ref[r, e * L + l] for l in range(L)]
                for s in range(ns)
            ]
            normed = small_norm_multi(added)
            for s in range(ns):
                sts[s][e] = normed[s]

    def sbox_streams(sts, e):
        outs = _pow_alpha_multi(
            L, [sts[s][e] for s in range(ns)], cfg.alpha, p_limbs, n0inv,
            tail_norm_multi, lb,
        )
        for s in range(ns):
            sts[s][e] = outs[s]

    def sbox_streams_all(sts):
        """All t*ns full-round S-box chains in one interleaved emission."""
        outs = _pow_alpha_multi(
            L, [sts[s][e] for s in range(ns) for e in range(t)],
            cfg.alpha, p_limbs, n0inv, tail_norm_multi, lb,
        )
        for s in range(ns):
            for e in range(t):
                sts[s][e] = outs[s * t + e]

    def mds_streams_mxu(sts):
        """MDS via the MXU limb-convolution (docs/DESIGN.md §24): one matmul
        over the full tile, then all t*ns output REDC chains interleaved."""
        full = [
            [
                jnp.concatenate([sts[s][e][l] for s in range(ns)], axis=0)
                for l in range(L)
            ]
            for e in range(t)
        ]
        cols_list = _mds_mxu_cols(L, t, full, mdsw_ref)
        red = _redc_multi(
            L,
            [
                [c[s * h : (s + 1) * h] for c in cols_list[i]]
                for s in range(ns)
                for i in range(t)
            ],
            p_limbs,
            n0inv,
            tail_norm_multi,
            lb,
        )
        return [[red[s * t + i] for i in range(t)] for s in range(ns)]

    def mds_streams(sts, row_ints_table):
        news = [[None] * t for _ in range(ns)]
        if wide_interleave:
            # All t output rows x ns streams share one interleaved REDC per
            # accumulation group (rows are mutually independent).
            parts = [[[] for _ in range(t)] for _ in range(ns)]
            for js in groups:
                red = _redc_multi(
                    L,
                    [
                        _mds_row_cols(L, t, sts[s], row_ints_table[i], js)
                        for s in range(ns)
                        for i in range(t)
                    ],
                    p_limbs,
                    n0inv,
                    tail_norm_multi,
                    lb,
                )
                for s in range(ns):
                    for i in range(t):
                        parts[s][i].append(red[s * t + i])
            if G == 1:
                for s in range(ns):
                    for i in range(t):
                        news[s][i] = parts[s][i][0]
            else:
                normed = small_norm_multi(
                    [_sum_limbs(parts[s][i]) for s in range(ns) for i in range(t)]
                )
                for s in range(ns):
                    for i in range(t):
                        news[s][i] = normed[s * t + i]
            return news
        for i in range(t):
            parts = [[] for _ in range(ns)]
            for js in groups:
                red = _redc_multi(
                    L,
                    [
                        _mds_row_cols(L, t, sts[s], row_ints_table[i], js)
                        for s in range(ns)
                    ],
                    p_limbs,
                    n0inv,
                    tail_norm_multi,
                    lb,
                )
                for s in range(ns):
                    parts[s].append(red[s])
            if G == 1:
                for s in range(ns):
                    news[s][i] = parts[s][0]
            else:
                normed = small_norm_multi(
                    [_sum_limbs(parts[s]) for s in range(ns)]
                )
                for s in range(ns):
                    news[s][i] = normed[s]
        return news

    def round_body(r, st4, full: bool):
        sts = unpack_streams(st4)
        ark_norm_streams(sts, r, ark_ref)
        if full:
            if wide_interleave:
                sbox_streams_all(sts)
            else:
                for e in range(t):
                    sbox_streams(sts, e)
        else:
            sbox_streams(sts, 0)
        if mdsw_ref is not None:
            return pack_streams(mds_streams_mxu(sts))
        return pack_streams(mds_streams(sts, mds_ints))

    half = cfg.full_rounds // 2
    st4 = st4_init

    st4 = jax.lax.fori_loop(0, half, lambda r, s: round_body(r, s, True), st4)

    if not optimized:
        st4 = jax.lax.fori_loop(
            half, half + cfg.partial_rounds, lambda r, s: round_body(r, s, False),
            st4,
        )
    else:
        from ..poseidon.optimized import optimized_partial_layers

        layers = optimized_partial_layers(cfg)
        d_ints = tuple(
            tuple(tuple(int(v) for v in fs.int_to_mont_limbs(c)) for c in row)
            for row in layers.dense
        )

        sts = unpack_streams(st4)
        ark_norm_streams(sts, half, ark_ref)
        sbox_streams(sts, 0)
        st4 = pack_streams(sts)

        def opt_body(r, s4):
            sts = unpack_streams(s4)
            ark_norm_streams(sts, r, popt_ref)
            row0 = [
                [popt_ref[r, (t + e) * L + l] for l in range(L)] for e in range(t)
            ]
            col0 = [
                [popt_ref[r, (2 * t + i) * L + l] for l in range(L)]
                for i in range(t - 1)
            ]
            per_stream = [
                _sparse_cols_list(L, t, sts[s], row0, col0, groups)
                for s in range(ns)
            ]
            reduced = [[] for _ in range(ns)]
            if wide_interleave:
                # All (G + t - 1) sparse column lists x ns streams are
                # mutually independent: one interleaved REDC emission.
                red = _redc_multi(
                    L,
                    [
                        per_stream[s][idx]
                        for s in range(ns)
                        for idx in range(G + t - 1)
                    ],
                    p_limbs, n0inv, tail_norm_multi, lb,
                )
                for s in range(ns):
                    reduced[s] = red[s * (G + t - 1):(s + 1) * (G + t - 1)]
            else:
                # Interleave across streams per sparse column-list index
                # (row0-dot groups first, then the t-1 column products).
                for idx in range(G + t - 1):
                    red = _redc_multi(
                        L, [per_stream[s][idx] for s in range(ns)], p_limbs,
                        n0inv, tail_norm_multi, lb,
                    )
                    for s in range(ns):
                        reduced[s].append(red[s])
            if G == 1:
                for s in range(ns):
                    sts[s][0] = reduced[s][0]
            else:
                normed = small_norm_multi(
                    [_sum_limbs(reduced[s][:G]) for s in range(ns)]
                )
                for s in range(ns):
                    sts[s][0] = normed[s]
            for s in range(ns):
                for i in range(1, t):
                    sts[s][i] = [
                        a + b for a, b in zip(reduced[s][G + i - 1], sts[s][i])
                    ]  # limbs <= 2^(lb+1)
            if needs_fold:
                folded = _top_fold_multi(
                    [sts[s][i] for s in range(ns) for i in range(1, t)],
                    rho_half_ints, lb,
                )
                for s in range(ns):
                    for i in range(1, t):
                        sts[s][i] = folded[s * (t - 1) + i - 1]
            sbox_streams(sts, 0)
            return pack_streams(sts)

        st4 = jax.lax.fori_loop(0, cfg.partial_rounds - 1, opt_body, st4)

        sts = unpack_streams(st4)
        for e in range(t):
            normed = small_norm_multi([sts[s][e] for s in range(ns)])
            for s in range(ns):
                sts[s][e] = normed[s]
        st4 = pack_streams(mds_streams(sts, d_ints))

    st4 = jax.lax.fori_loop(
        half + cfg.partial_rounds, cfg.rounds, lambda r, s: round_body(r, s, True), st4
    )
    if relaxed:
        # Exit canonicalization: one exact sequential pass restores the
        # canonical-limb output contract (values are < 4.1p << R, so _norm1
        # is exact on quasi-canonical limbs).
        sts = unpack_streams(st4)
        flat = _norm1_multi([sts[s][e] for s in range(ns) for e in range(t)], lb)
        for s in range(ns):
            for e in range(t):
                sts[s][e] = flat[s * t + e]
        st4 = pack_streams(sts)
    if unsigned:
        st4 = st4.astype(jnp.int32)  # canonical limbs < 2^lb: exact
    out_ref[:] = st4


def _permute_kernel(
    ark_ref, popt_ref, state_ref, out_ref, *, cfg, optimized, pipelined=False,
    lane_streams=1, mds_group=None, relaxed=False, wide_interleave=False,
    mdsw_ref=None,
):
    if lane_streams > 1:
        return _permute_kernel_streams(
            ark_ref, popt_ref, state_ref, out_ref,
            cfg=cfg, optimized=optimized, lane_streams=lane_streams,
            mds_group=mds_group, relaxed=relaxed,
            wide_interleave=wide_interleave, mdsw_ref=mdsw_ref,
        )
    fs = cfg.field
    L = fs.nlimbs
    t = cfg.t
    lb = fs.limb_bits
    unsigned = fs.unsigned_accum
    fc = mont.field_consts(fs)
    p_limbs = fc["p_tuple"]
    n0inv = int(fc["n0inv"])
    # Montgomery-form MDS limbs as static ints.
    mds_ints = tuple(
        tuple(tuple(int(v) for v in fs.int_to_mont_limbs(c)) for c in row)
        for row in cfg.mds
    )
    groups = _mds_groups(L, t, mds_group, quasi=relaxed, lb=lb, unsigned=unsigned)
    # Sparse-phase value-overflow protection (block comment at _top_fold_multi).
    needs_fold = optimized and _sparse_needs_fold(cfg, len(groups))
    rho_half_ints = tuple(
        int(v) for v in fs.int_to_limbs((fs.r >> 1) % fs.modulus)
    )
    if relaxed:
        tail_norm = functools.partial(_relaxed_norm, passes=2, lb=lb)
        tail_norm_multi = functools.partial(_relaxed_norm_multi, passes=2, lb=lb)
        small_norm = functools.partial(_relaxed_norm, passes=1, lb=lb)
        small_norm_multi = functools.partial(_relaxed_norm_multi, passes=1, lb=lb)
    else:
        tail_norm = tail_norm_multi = None  # helpers default to exact norms
        small_norm = functools.partial(_norm1, lb=lb)
        small_norm_multi = functools.partial(_norm1_multi, lb=lb)

    def unpack(st4):
        return [[st4[e, l] for l in range(L)] for e in range(t)]

    def pack(elems):
        return jnp.stack([jnp.stack(e) for e in elems])

    def ark_norm(elems, r, ref=None):
        """ARK add (SMEM scalars indexed by round) + renorm so every multiplier
        input is canonical (quasi-canonical when relaxed); chain-interleaved
        when pipelined."""
        ref = ark_ref if ref is None else ref
        added = [
            [elems[e][l] + ref[r, e * L + l] for l in range(L)] for e in range(t)
        ]
        if pipelined:
            return small_norm_multi(added)
        return [small_norm(row) for row in added]

    def round_body(r, st4, full: bool):
        elems = ark_norm(unpack(st4), r)
        if full:
            if pipelined:
                elems = _pow_alpha_multi(
                    L, elems, cfg.alpha, p_limbs, n0inv, tail_norm_multi, lb
                )
            else:
                elems = [
                    _pow_alpha(L, x, cfg.alpha, p_limbs, n0inv, tail_norm, lb)
                    for x in elems
                ]
        else:
            elems[0] = _pow_alpha(
                L, elems[0], cfg.alpha, p_limbs, n0inv, tail_norm, lb
            )
        if mdsw_ref is not None:
            return pack(
                _mds_apply_mxu(
                    L, t, elems, mdsw_ref, p_limbs, n0inv, tail_norm_multi
                )
            )
        mds = _mds_apply_multi if pipelined else _mds_apply
        return pack(
            mds(
                L, t, elems, mds_ints, p_limbs, n0inv, groups,
                final_norm=tail_norm_multi if pipelined else tail_norm,
                sum_norm=small_norm_multi if pipelined else small_norm,
                lb=lb,
            )
        )

    half = cfg.full_rounds // 2
    st4 = state_ref[:]
    if unsigned:
        # uint32 accumulation plan (13-bit limbs, DESIGN §25): see
        # _permute_kernel_streams.
        st4 = st4.astype(jnp.uint32)

    st4 = jax.lax.fori_loop(0, half, lambda r, s: round_body(r, s, True), st4)

    if not optimized:
        st4 = jax.lax.fori_loop(
            half, half + cfg.partial_rounds, lambda r, s: round_body(r, s, False),
            st4,
        )
    else:
        # Optimized partial phase (sparse MDS decomposition, see
        # poseidon/optimized.py).  popt_ref rows r = 0..k-2 hold
        # č ‖ row0 ‖ col0 limbs; the final dense matrix D is static.
        from ..poseidon.optimized import optimized_partial_layers

        layers = optimized_partial_layers(cfg)
        d_ints = tuple(
            tuple(tuple(int(v) for v in fs.int_to_mont_limbs(c)) for c in row)
            for row in layers.dense
        )

        # First partial round: original ark row (index half), sbox0 only.
        elems = ark_norm(unpack(st4), half)
        elems[0] = _pow_alpha(L, elems[0], cfg.alpha, p_limbs, n0inv, tail_norm, lb)
        st4 = pack(elems)

        def opt_body(r, s4):
            # x += č_r, renormalize (also re-canonicalizes the 2^13-limb
            # carries left by the previous sparse apply).
            els = ark_norm(unpack(s4), r, ref=popt_ref)
            row0 = [
                [popt_ref[r, (t + e) * L + l] for l in range(L)] for e in range(t)
            ]
            col0 = [
                [popt_ref[r, (2 * t + i) * L + l] for l in range(L)]
                for i in range(t - 1)
            ]
            sparse = _sparse_apply_multi if pipelined else _sparse_apply
            els = sparse(
                L, t, els, row0, col0, p_limbs, n0inv, groups,
                final_norm=tail_norm_multi if pipelined else tail_norm,
                sum_norm=small_norm_multi if pipelined else small_norm,
                lb=lb,
            )
            if needs_fold:
                els[1:] = _top_fold_multi(els[1:], rho_half_ints, lb)
            els[0] = _pow_alpha(L, els[0], cfg.alpha, p_limbs, n0inv, tail_norm, lb)
            return pack(els)

        st4 = jax.lax.fori_loop(0, cfg.partial_rounds - 1, opt_body, st4)

        # Final accumulated dense matrix D (inputs renormalized first: the last
        # sparse apply leaves 2^13 limbs, and the dense column bound needs
        # canonical — or quasi-canonical — inputs).
        up = unpack(st4)
        elems = (
            small_norm_multi(up) if pipelined else [small_norm(limbs) for limbs in up]
        )
        mds = _mds_apply_multi if pipelined else _mds_apply
        st4 = pack(
            mds(
                L, t, elems, d_ints, p_limbs, n0inv, groups,
                final_norm=tail_norm_multi if pipelined else tail_norm,
                sum_norm=small_norm_multi if pipelined else small_norm,
                lb=lb,
            )
        )

    st4 = jax.lax.fori_loop(
        half + cfg.partial_rounds, cfg.rounds, lambda r, s: round_body(r, s, True), st4
    )
    if relaxed:
        # Exit canonicalization (see _permute_kernel_streams).
        st4 = pack(_norm1_multi(unpack(st4), lb))
    if unsigned:
        st4 = st4.astype(jnp.int32)  # canonical limbs < 2^lb: exact
    out_ref[:] = st4


def _permute_kernel_with_w(ark_ref, popt_ref, mdsw_ref, state_ref, out_ref, **kw):
    """Kernel entry for the mds_mxu variant: same body, one extra VMEM input
    (the bf16 MDS weight matrix) between the SMEM constants and the state."""
    _permute_kernel(ark_ref, popt_ref, state_ref, out_ref, mdsw_ref=mdsw_ref, **kw)


@functools.lru_cache(maxsize=None)
def cios_permute_fn(
    cfg: PoseidonConfig,
    interpret: bool = False,
    sublanes: int = SUBLANES,
    optimized: bool = True,
    pipelined: bool = False,
    lane_streams: int | None = None,
    mds_group: int | None = None,
    relaxed: bool = True,
    wide_interleave: bool = False,
    mds_mxu: bool = False,
):
    """Jitted CIOS permutation: (t, L, B) -> (t, L, B), B % (sublanes*128) == 0.

    ``lane_streams=k`` splits each batch tile into k independent sub-tiles
    advanced in lockstep with interleaved carry chains (see
    ``_permute_kernel_streams``); requires ``sublanes % (8 * k) == 0``.
    Default (``None``): 2 when the tile allows it — the fastest measured shape
    (docs/DESIGN.md §6) — else 1.

    ``relaxed=True`` (production default) replaces every in-round sequential
    carry normalization with the chain-free epsilon-redundant form
    (``_relaxed_norm_multi``); measured on v5e at B=2^20: 6.89M vs 6.84M
    perms/s at the default 16:2 tile, and +10% (6.57M vs 5.96M) at the
    1-stream fallback shape where carry-chain latency is exposed
    (bench/relaxed_probe.py; oracle parity enforced for both modes).

    Any state width is supported: MDS dots wider than the lazy-REDC int32
    budget (t*L + L - 1 >= 128, i.e. t >= 5 at L = 22) split into accumulation
    groups with one shared REDC each (``_mds_groups``).  ``mds_group`` forces a
    smaller group size (tests only).

    ``mds_mxu=True`` computes every MDS limb-convolution on the MXU as a
    bf16 matmul against a constant weight matrix (exactness analysis in the
    module-level block comment; design in docs/DESIGN.md §24).  Forces
    ``optimized=False``: the dense matrix is applied every round — the
    sparse partial-round decomposition exists to cut VPU multiplies, which
    the MXU makes moot (and its per-round matrices are runtime-indexed,
    unlike the single constant dense weight).
    """
    if mds_mxu:
        optimized = False
        if cfg.field.limb_bits != 12:
            # The 6-bit position rebin (cols[k] = pos[2k] + pos[2k+1] << 6)
            # assumes two 6-bit pieces per limb, i.e. the 12-bit plan.
            raise ValueError("mds_mxu supports the 12-bit limb plan only")
        if wide_interleave or pipelined:
            # The streams kernel's MXU branch replaces the whole MDS emission,
            # so these schedule variants would be silently ignored — reject the
            # combination rather than mislabel an A/B measurement (same rule as
            # the wide_interleave-without-streams guard below).
            raise ValueError("mds_mxu is incompatible with wide_interleave/pipelined")
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
    R = cfg.rounds
    tile_lanes = sublanes * 128
    # SMEM round constants carry the kernel's accumulator dtype so in-kernel
    # scalar reads never mix signedness (uint32 for the 13-bit plan).
    smem_dtype = np.uint32 if fs.unsigned_accum else np.int32
    # Raises if L itself exceeds the 32-bit budget (quasi budget when relaxed).
    _mds_groups(
        L, t, mds_group, quasi=relaxed, lb=fs.limb_bits,
        unsigned=fs.unsigned_accum,
    )
    ark_np = np.stack(
        [
            np.concatenate([fs.int_to_mont_limbs(c) for c in row])
            for row in cfg.ark
        ]
    ).astype(smem_dtype)  # (R, t*L)

    optimized = optimized and cfg.partial_rounds >= 2
    if optimized:
        from ..poseidon.optimized import optimized_partial_layers

        layers = optimized_partial_layers(cfg)
        rows = []
        for c, sp in zip(layers.constants, layers.sparse):
            rows.append(
                np.concatenate(
                    [fs.int_to_mont_limbs(v) for v in c]
                    + [fs.int_to_mont_limbs(v) for v in sp.row0]
                    + [fs.int_to_mont_limbs(v) for v in sp.col0]
                )
            )
        popt_np = np.stack(rows).astype(smem_dtype)  # (k-1, (3t-1)*L)
    else:
        popt_np = np.zeros((1, 1), dtype=smem_dtype)

    if wide_interleave and lane_streams < 2:
        # Only the streams kernel implements the wide emission; silently
        # running the plain kernel would mislabel any A/B sweep.
        raise ValueError(
            "wide_interleave requires lane_streams >= 2 (the streams kernel)"
        )
    kernel_kwargs = dict(
        cfg=cfg, optimized=optimized, pipelined=pipelined,
        lane_streams=lane_streams, mds_group=mds_group, relaxed=relaxed,
        wide_interleave=wide_interleave,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    extra_inputs = []
    if mds_mxu:
        mds_ints = tuple(
            tuple(tuple(int(v) for v in fs.int_to_mont_limbs(c)) for c in row)
            for row in cfg.mds
        )
        mds_w = jnp.asarray(
            _mds_mxu_weights(L, t, mds_ints), dtype=jnp.bfloat16
        )
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        extra_inputs.append(mds_w)
        kernel = functools.partial(_permute_kernel_with_w, **kernel_kwargs)
    else:
        kernel = functools.partial(_permute_kernel, **kernel_kwargs)
    in_specs.append(
        pl.BlockSpec(
            (t, L, sublanes, 128), lambda i: (0, 0, i, 0),
            memory_space=pltpu.VMEM,
        )
    )

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
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (t, L, sublanes, 128), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
            ),
            cost_estimate=pl.CostEstimate(
                flops=cfg.rounds * 30 * 2 * L * L * tile_lanes,
                bytes_accessed=2 * t * L * tile_lanes * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(jnp.asarray(ark_np), jnp.asarray(popt_np), *extra_inputs, st4)
        return out.reshape(t, L, B)

    return run
