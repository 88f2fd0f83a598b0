"""Fused Pallas kernel for the Monolith permutation (fast tier).

Monolith's round (ePrint 2023/1025 structure; see monolith/config.py) maps
onto the TPU VPU better than any power-map family:

* **Bars** run entirely in registers: one Montgomery-by-1 REDC + exact
  conditional subtract brings the element to canonical bits, a static
  shift/or network re-slices 12-bit limbs into the (8, ..., rem) bar chunks,
  the chi-like S-box is ~8 bitwise int32 ops per chunk (no tables, no
  gathers), and one REDC by R^2 returns to Montgomery form — 2 REDCs per
  barred element per round is the entire nonlinear-layer multiply cost.
* **Bricks** (x_i += x_{i-1}^2) are t-1 symmetric-column Montgomery squares
  (``_sqr_cols``, ~L^2/2 multiplies each) — the only full-width multiplies.
* **Concrete**: the Goldilocks power-of-two circulant is multiplication-
  free (static limb-axis shifts + in-limb scales, tree-accumulated in a
  widened (L+E)-limb column space and rho-folded back exactly); the 31-bit
  Cauchy matrices reuse the lazy-REDC MDS machinery of ``pallas_cios``
  (one shared reduction per output row).
* **Mersenne-prime fields** (p = 2^n - 1, e.g. Mersenne31) get a dedicated
  canonical-domain kernel with ZERO Montgomery reductions anywhere: the
  Montgomery form is a bit-rotation of the canonical value (R mod p = 2^s),
  so the boundary maps are pure bit movement, Bricks squares reduce by the
  2^(12L) = 2^s shift-fold, and Bars chi the canonical bits directly
  (``_monolith_kernel_mersenne``; round constants enter PLAIN, see
  ``monolith_rc_plane``).

Value discipline: the kernel keeps values < ~8p between sites (far below
R = 2^(12 L) for the bar-safe fields, whose R/p is >= 32) — every bound is
simulated with exact python ints in ``check_kernel_bounds`` at build time,
and configs that would overflow fall back to the XLA tier.  Layout, tiling
and 2-way lane-stream interleaving follow ``pallas_cios`` (tiles
(t, L, SUBLANES, 128)); round constants come in via SMEM, all other
constants are python-int immediates.  Bit-exactness vs the scalar oracle is
enforced in tests/test_monolith.py (tiny field in CI, full fields on TPU
via the probe parity gate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import LIMB_BITS, LIMB_MASK
from ..monolith.config import MonolithConfig, bar_chunks
from ..monolith.permutation import _chi_chunk
from . import montgomery as mont
from .pallas_cios import (
    SUBLANES,
    TILE_LANES,
    _mds_groups,
    _mds_row_cols,
    _norm1_multi,
    _redc_multi,
    _sqr_cols,
    _sum_limbs,
)
from .pallas_p2 import _fold_norm_multi

__all__ = [
    "monolith_kernel_fn",
    "monolith_rc_plane",
    "check_kernel_bounds",
    "TILE_LANES",
    "SUBLANES",
]


def monolith_rc_plane(cfg: "MonolithConfig") -> "np.ndarray":
    """(rounds, t*L) int32 round-constant SMEM plane in the domain the kernel
    body expects: plain canonical for the Mersenne canonical-domain kernel,
    Montgomery form for the generic kernel."""
    fs = cfg.field
    if check_kernel_bounds(cfg)["rot"] is not None:
        conv = lambda c: fs.int_to_limbs(c % fs.modulus)  # noqa: E731
    else:
        conv = fs.int_to_mont_limbs
    return np.stack(
        [np.concatenate([conv(c) for c in row]) for row in cfg.rc]
    ).astype(np.int32)


# ---------------------------------------------------------------------------
# Static value-bound simulation (exact python ints): the kernel's soundness
# proof, evaluated once per config at build time.
# ---------------------------------------------------------------------------


def _fold_post(R: int, rho: int, vmax: int):
    """(folds, post-fold exclusive bound): the _fold_count recurrence, also
    returning the final bound (< R when folds were needed; vmax otherwise)."""
    folds = 0
    while vmax > R:
        cm = (vmax - 1) // R
        cand = cm * rho + (vmax - 1 - cm * R)
        if cm >= 1:
            cand = max(cand, (cm - 1) * rho + (R - 1))
        vmax = cand + 1
        folds += 1
        if folds > 16:
            raise ValueError("rho-folding does not converge; bad field spec")
    return folds, vmax


@functools.lru_cache(maxsize=None)
def check_kernel_bounds(cfg: MonolithConfig) -> dict:
    """Simulate worst-case element VALUES through the kernel's round sites
    with exact python ints, iterated to a round-to-round fixpoint.

    Every normalization site gets a static top-carry rho-fold count derived
    from its simulated bound (0 folds = the plain exact pass); REDC tails
    that could still exceed R (or canonicalize preconditions that fail)
    raise ValueError — such configs run the XLA tier instead.  Returns the
    static geometry + fold counts the kernel bakes in."""
    from ..monolith.permutation import scaled_concrete_geometry

    fs = cfg.field
    p, R = fs.modulus, fs.r
    t = cfg.t
    L = fs.nlimbs
    rho = R % p
    geo = scaled_concrete_geometry(cfg)
    info: dict = {}

    def redc_out(T: int) -> int:
        """REDC + plain-norm1 tail: sound only while the result stays < R."""
        out = T // R + p + 1  # incl. redundant-m excess
        if out >= R:
            raise ValueError(
                f"Monolith kernel value bound reaches R over {fs.name} at "
                f"t={t}; use the XLA tier"
            )
        return out

    rot = mersenne_rot_shift(fs)
    info["rot"] = rot
    if rot is not None:
        # --- Mersenne canonical-domain path: NO Montgomery machinery at all.
        # Every round starts with an exact fold-canonicalization (any value
        # < R -> unique representative < p, no multiplies), so bound
        # propagation is per-round-local; the sites needing static fold
        # counts are the squares, the bricks add, the concrete, the rc add.
        # (Measured alternative: canonicalizing only the u barred elements
        # and keeping the rest lazily < R costs MORE — the extra rho-folds
        # at every square/add site outweigh the saved canon chains: 52-53M
        # vs 55-57M perms/s for M31 t=16 on v5e.)
        s = rot
        # Square reduce: T = x^2 < p^2; post column-fold value < R + Hi*2^s.
        hi_sq = ((p - 1) * (p - 1)) >> (LIMB_BITS * L)
        f_sq, v_sq = _fold_post(R, 1 << s, R + (hi_sq << s))
        # Bricks add: x_i (< p, canon'd at round entry) + square (< v_sq).
        f_add, v_add = _fold_post(R, rho, p + v_sq)
        v = max(p, v_add)  # opening concrete sees < p; round concrete this
        if geo is not None:
            total = geo["row_sum"] * v
            if total >= 1 << (LIMB_BITS * (L + geo["E"])):
                raise ValueError("scaled concrete widened plane overflows")
            hi_max = total >> (LIMB_BITS * L)
            f_conc, v_conc = _fold_post(R, rho, R + hi_max * rho)
        else:
            # Dense concrete via lazy canonical accumulation: one shared
            # Mersenne reduce per output row.  Column int32 budget: t*L
            # products of < 2^24 per column plus the shift-fold.
            if t * L * (1 << (2 * LIMB_BITS)) >= 1 << 30:
                raise ValueError("dense Mersenne concrete exceeds int32 columns")
            hi_max = (t * (p - 1) * v) >> (LIMB_BITS * L)
            f_conc, v_conc = _fold_post(R, 1 << s, R + (hi_max << s))
        f_rc, v_rc = _fold_post(R, rho, v_conc + p)
        if v_rc > R:
            raise ValueError("Mersenne round value bound exceeds R")
        info["geo"] = geo
        info["folds"] = {"sq": f_sq, "add": f_add, "conc": f_conc, "rc": f_rc}
        return info

    # --- Generic Montgomery path ---
    # Bar outputs: to-mont REDC of canonical bits by R^2 (both operands < p).
    v_barred = redc_out(p * p)
    v = 4 * p  # sponge-invariant inputs (absorb adds on < 2p outputs)
    folds = {"rc": 0, "sq": 0, "add": 0, "conc": 0}
    v_rc = v
    for _ in range(cfg.rounds + 4):  # iterate past the round count to fixpoint
        # --- concrete (also the opening layer), input bound v ---
        if geo is not None:
            total = geo["row_sum"] * v
            if total >= 1 << (LIMB_BITS * (L + geo["E"])):
                raise ValueError("scaled concrete widened plane overflows")
            hi_max = total >> (LIMB_BITS * L)
            f, v_conc = _fold_post(R, rho, R + hi_max * rho)
            folds["conc"] = max(folds["conc"], f)
        else:
            groups = _mds_groups(L, t)
            part = redc_out(max(len(g) for g in groups) * p * v)
            v_conc = len(groups) * part
            if v_conc >= R:
                raise ValueError("grouped concrete sum reaches R")
        # --- + round constant, fold-normalized ---
        f, v_rc = _fold_post(R, rho, v_conc + p)
        folds["rc"] = max(folds["rc"], f)
        # --- bars (next round's entry): REDC by plain 1, canonicalize ---
        if v_rc // R + p + 1 >= 2 * p:
            raise ValueError("canonicalize precondition (< 2p) violated")
        # --- bricks: squares fold-normalized, adds fold-normalized ---
        v_sq_in = max(v_rc, v_barred)
        f, v_sq = _fold_post(R, rho, v_sq_in * v_sq_in // R + p + 1)
        folds["sq"] = max(folds["sq"], f)
        f, v_add = _fold_post(R, rho, v_sq_in + v_sq)
        folds["add"] = max(folds["add"], f)
        v = max(v_add, v_barred)  # element 0 is barred but not bricks-added
    redc_out(v_rc * p)  # closing REDC by one_mont (< 2p output invariant)
    info["geo"] = geo
    info["folds"] = folds
    return info


# ---------------------------------------------------------------------------
# Kernel building blocks over limb lists (tiles of shape (h, 128)).
# ---------------------------------------------------------------------------


def _canon_multi(lists, p_limbs):
    """Exact canonicalization (value < 2p in, unique repr < p out) of several
    limb lists, carry/borrow chains interleaved."""
    ys = _norm1_multi(lists)  # exact: value < 2p < R, top carry zero
    n = len(ys)
    L = len(p_limbs)
    zs = [[] for _ in range(n)]
    borrows = [None] * n
    for k in range(L):
        for e in range(n):
            d = ys[e][k] - p_limbs[k]
            if borrows[e] is not None:
                d = d - borrows[e]
            zs[e].append(d & LIMB_MASK)
            borrows[e] = (d >> LIMB_BITS) & 1  # 1 iff negative (arith shift)
    outs = []
    for e in range(n):
        ge_p = borrows[e] == 0  # no final borrow <=> y >= p
        outs.append([jnp.where(ge_p, zs[e][k], ys[e][k]) for k in range(L)])
    return outs


def _bar_multi(lists, fs):
    """Bar on canonical-exact limb lists: static chunk slicing + chi + static
    reassembly (pure bitwise VPU ops, unrolled at trace time)."""
    chunks = bar_chunks(fs)
    L = fs.nlimbs
    outs = []
    for limbs in lists:
        cvals = []
        bit0 = 0
        for w in chunks:
            k, off = divmod(bit0, LIMB_BITS)
            v = limbs[k] >> off if off else limbs[k]
            if off + w > LIMB_BITS:
                v = v | (limbs[k + 1] << (LIMB_BITS - off))
            cvals.append(_chi_chunk(v & ((1 << w) - 1), w))
            bit0 += w
        new = []
        for li in range(L):
            lo_bit = li * LIMB_BITS
            acc = None
            bit0 = 0
            for v, w in zip(cvals, chunks):
                if bit0 + w > lo_bit and bit0 < lo_bit + LIMB_BITS:
                    part = (
                        v >> (lo_bit - bit0) if bit0 < lo_bit else v << (bit0 - lo_bit)
                    )
                    acc = part if acc is None else acc | part
                bit0 += w
            new.append(
                (acc if acc is not None else jnp.zeros_like(limbs[0])) & LIMB_MASK
            )
        outs.append(new)
    return outs


def mersenne_rot_shift(fs) -> int | None:
    """For Mersenne-prime fields (p = 2^n - 1) the Montgomery form is a pure
    bit-rotation of the canonical value: R mod p = 2^s with s = 12L mod n,
    so mont(x) = rotl_s(x) on n-bit strings.  The whole permutation can
    therefore run in the CANONICAL domain with zero Montgomery reductions:
    ``_monolith_kernel_mersenne`` converts at the permutation boundary with
    bit rotations (``_rot_bits_multi``), canonicalizes each round entry
    multiply-free (``_mersenne_canon_multi``), and reduces squares by the
    2^(12L) = 2^s shift-fold — design narrative in docs/DESIGN.md §16.2.
    Returns the shift s, or None when the trick does not apply (non-Mersenne
    p, or the 12L - n high bits span more than one limb)."""
    n = fs.modulus_bit_size
    if fs.modulus != (1 << n) - 1:
        return None
    s = (LIMB_BITS * fs.nlimbs) % n
    if s == 0 or s >= LIMB_BITS:
        return None
    return s


def _mersenne_canon_multi(lists, fs, p_limbs):
    """Exact canonicalization of Montgomery-domain values < R over a
    Mersenne prime: fold the s high bits with 2^n ≡ 1 (value < 2p), then the
    usual exact-carry + conditional subtract.  No multiplies."""
    n = fs.modulus_bit_size
    L = fs.nlimbs
    off = n % LIMB_BITS  # bit position of the fold boundary in the top limb
    folded = []
    for limbs in lists:
        hi = limbs[L - 1] >> off
        top = limbs[L - 1] & ((1 << off) - 1)
        folded.append([limbs[0] + hi] + list(limbs[1 : L - 1]) + [top])
    return _canon_multi(folded, p_limbs)


def _rot_bits_multi(lists, fs, shift):
    """Bit-rotate canonical-exact n-bit values left by ``shift`` (mod-p
    multiplication by 2^shift over a Mersenne prime, as pure bit movement)."""
    n = fs.modulus_bit_size
    L = fs.nlimbs
    outs = []
    for limbs in lists:
        acc = [None] * L
        for k in range(L):
            w = min(LIMB_BITS, n - LIMB_BITS * k)
            if w <= 0:
                break
            v = limbs[k] & ((1 << w) - 1)
            pos = (LIMB_BITS * k + shift) % n
            if pos + w <= n:
                _put_bits(acc, v, pos, w)
            else:
                lo_w = n - pos
                _put_bits(acc, v & ((1 << lo_w) - 1), pos, lo_w)
                _put_bits(acc, v >> lo_w, 0, w - lo_w)
        outs.append(
            [a if a is not None else jnp.zeros_like(limbs[0]) for a in acc]
        )
    return outs


def _put_bits(acc, v, b0, w):
    """Scatter a w-bit value at bit position b0 into a 12-bit limb list."""
    k, off = divmod(b0, LIMB_BITS)
    part = (v << off) & LIMB_MASK
    acc[k] = part if acc[k] is None else acc[k] | part
    done = LIMB_BITS - off
    while done < w:
        k += 1
        part = (v >> done) & LIMB_MASK
        acc[k] = part if acc[k] is None else acc[k] | part
        done += LIMB_BITS


def _plain_sqr_cols(L, a):
    """Plain (un-doubled) schoolbook columns of a^2: L^2 products, every
    column <= L * 2^24 — the bound the Mersenne shift-fold needs (the
    symmetric builder's doubled operands would overflow after the shift)."""
    cols = [None] * (2 * L)
    for i in range(L):
        for j in range(L):
            term = a[i] * a[j]
            k = i + j
            cols[k] = term if cols[k] is None else cols[k] + term
    cols[2 * L - 1] = jnp.zeros_like(a[0])
    return cols


def _mersenne_reduce_multi(cols_list, fs, s, rho_limbs, folds):
    """Reduce 2L-column schoolbook products over a Mersenne prime with NO
    Montgomery machinery: exact-carry the columns, fold the high limbs with
    2^(12L) ≡ 2^s (a shift-add), close with ``folds`` top-carry rho-folds.
    Output: limbs <= 2^12, value < R, exact mod p."""
    L = fs.nlimbs
    wide = _norm1_multi(cols_list)  # exact: value < R^2 fits 2L limbs
    res = [
        [w[k] + (w[L + k] << s) for k in range(L)]  # limbs <= 2^12 + 2^23
        for w in wide
    ]
    return _fold_norm_multi(res, rho_limbs, folds)


def _const_mul_cols(L, a, b_ints):
    """Schoolbook columns of a * const (static limb tuple; zero limbs skipped)."""
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
    return cols


def _scaled_concrete_multi(streams, geo, fs, rho_limbs, folds):
    """Multiplication-free scaled Concrete (small plain-integer matrices),
    per stream: each entry's 12-bit limb digits scale-and-place into a
    widened (L+E)-limb column space, exact interleaved carry, hi-limb
    rho-fold back into L limbs (all bounds pre-proved)."""
    digits = geo["digits"]
    E = geo["E"]
    t = len(digits)
    L = fs.nlimbs
    all_cols = []
    for xs in streams:
        for i in range(t):
            cols = [None] * (L + E)
            for j in range(t):
                for q, m in digits[i][j]:
                    for l in range(L):
                        term = xs[j][l] * m if m != 1 else xs[j][l]
                        k = q + l
                        cols[k] = term if cols[k] is None else cols[k] + term
            all_cols.append(
                [c if c is not None else jnp.zeros_like(xs[0][0]) for c in cols]
            )
    wide = _norm1_multi(all_cols)  # exact over L+E limbs (top carry zero)
    res = []
    for w in wide:
        lo = list(w[:L])
        for k in range(E):
            hk = w[L + k]
            for l, rl in enumerate(rho_limbs):
                if rl:
                    lo[k + l] = lo[k + l] + hk * rl
        res.append(lo)
    res = _fold_norm_multi(res, rho_limbs, folds)
    ns = len(streams)
    return [res[s * t : (s + 1) * t] for s in range(ns)]


# ---------------------------------------------------------------------------
# The kernel.
# ---------------------------------------------------------------------------


def _monolith_kernel_mersenne(rc_ref, state_ref, out_ref, *, cfg, lane_streams):
    """Canonical-domain kernel for Mersenne-prime fields: ZERO Montgomery
    reductions anywhere.  The state converts Montgomery <-> canonical at the
    permutation boundary as pure bit rotations (m = rotl_s(x)); inside,
    squares reduce by the 2^(12L) ≡ 2^s shift-fold, Bars run on the
    canonical bits directly, and both Concrete paths are multiplication-free
    or constant-scaled.  Bound proofs: check_kernel_bounds' Mersenne branch."""
    fs = cfg.field
    L = fs.nlimbs
    t = cfg.t
    u = cfg.bars
    n = fs.modulus_bit_size
    ns = lane_streams
    fc = mont.field_consts(fs)
    p_limbs = fc["p_tuple"]
    rho_limbs = tuple(int(v) for v in fs.int_to_limbs(fs.r % fs.modulus))
    info = check_kernel_bounds(cfg)
    s = info["rot"]
    geo = info["geo"]
    folds = info["folds"]
    if geo is None:
        conc_plain = tuple(
            tuple(tuple(int(v) for v in fs.int_to_limbs(c % fs.modulus)) for c in row)
            for row in cfg.concrete
        )

    st4_init = state_ref[:]
    S = st4_init.shape[2]
    h = S // ns

    def unpack_streams(st4):
        return [
            [[st4[e, l, s_ * h : (s_ + 1) * h] for l in range(L)] for e in range(t)]
            for s_ in range(ns)
        ]

    def pack_streams(sts):
        return jnp.stack(
            [
                jnp.stack(
                    [
                        jnp.concatenate([sts[s_][e][l] for s_ in range(ns)], axis=0)
                        for l in range(L)
                    ]
                )
                for e in range(t)
            ]
        )

    def canon_all(sts):
        flat = _mersenne_canon_multi(
            [sts[s_][e] for s_ in range(ns) for e in range(t)], fs, p_limbs
        )
        return [flat[s_ * t : (s_ + 1) * t] for s_ in range(ns)]

    def concrete(sts):
        if geo is not None:
            return _scaled_concrete_multi(sts, geo, fs, rho_limbs, folds["conc"])
        cols_list = [
            _mds_row_cols(L, t, sts[s_], conc_plain[i], range(t))
            for s_ in range(ns)
            for i in range(t)
        ]
        red = _mersenne_reduce_multi(cols_list, fs, s, rho_limbs, folds["conc"])
        return [red[s_ * t : (s_ + 1) * t] for s_ in range(ns)]

    def round_body(r, st4):
        sts = canon_all(unpack_streams(st4))  # exact < p, no multiplies
        # --- Bars: directly on the canonical bits ---
        barred = _bar_multi(
            [sts[s_][e] for s_ in range(ns) for e in range(u)], fs
        )
        for s_ in range(ns):
            for e in range(u):
                sts[s_][e] = barred[s_ * u + e]
        # --- Bricks: plain-schoolbook squares + Mersenne shift-fold ---
        sq = _mersenne_reduce_multi(
            [
                _plain_sqr_cols(L, sts[s_][e])
                for s_ in range(ns)
                for e in range(t - 1)
            ],
            fs, s, rho_limbs, folds["sq"],
        )
        added = _fold_norm_multi(  # value < p + v_sq, rho-folded back < R
            [
                [a + b for a, b in zip(sts[s_][i], sq[s_ * (t - 1) + i - 1])]
                for s_ in range(ns)
                for i in range(1, t)
            ],
            rho_limbs,
            folds["add"],
        )
        for s_ in range(ns):
            for i in range(1, t):
                sts[s_][i] = added[s_ * (t - 1) + i - 1]
        # --- Concrete + round constants (last row zeros) ---
        sts = concrete(sts)
        flat = [
            [sts[s_][e][l] + rc_ref[r, e * L + l] for l in range(L)]
            for s_ in range(ns)
            for e in range(t)
        ]
        flat = _fold_norm_multi(flat, rho_limbs, folds["rc"])
        for s_ in range(ns):
            for e in range(t):
                sts[s_][e] = flat[s_ * t + e]
        return pack_streams(sts)

    # Entry: canonicalize the Montgomery values (< p exact) and rotate right
    # by s — the Montgomery -> canonical map over a Mersenne prime.
    sts = canon_all(unpack_streams(st4_init))
    flat = _rot_bits_multi(
        [sts[s_][e] for s_ in range(ns) for e in range(t)], fs, n - s
    )
    sts = [flat[s_ * t : (s_ + 1) * t] for s_ in range(ns)]
    st4 = pack_streams(concrete(sts))  # opening linear layer

    st4 = jax.lax.fori_loop(0, cfg.rounds, round_body, st4)

    # Exit: canonicalize, rotate left by s (canonical -> Montgomery); output
    # < p satisfies the framework-wide < 2p invariant.
    sts = canon_all(unpack_streams(st4))
    flat = _rot_bits_multi(
        [sts[s_][e] for s_ in range(ns) for e in range(t)], fs, s
    )
    sts = [flat[s_ * t : (s_ + 1) * t] for s_ in range(ns)]
    out_ref[:] = pack_streams(sts)


def _monolith_kernel(rc_ref, state_ref, out_ref, *, cfg, lane_streams):
    info = check_kernel_bounds(cfg)
    if info["rot"] is not None:
        return _monolith_kernel_mersenne(
            rc_ref, state_ref, out_ref, cfg=cfg, lane_streams=lane_streams
        )
    fs = cfg.field
    L = fs.nlimbs
    t = cfg.t
    u = cfg.bars
    ns = lane_streams
    fc = mont.field_consts(fs)
    p_limbs = fc["p_tuple"]
    n0inv = int(fc["n0inv"])
    rho_limbs = tuple(int(v) for v in fs.int_to_limbs(fs.r % fs.modulus))
    one_plain = (1,) + (0,) * (L - 1)
    r2_limbs = tuple(int(v) for v in fs.int_to_limbs(fs.r2_mod_p))
    one_mont = tuple(int(v) for v in fs.int_to_limbs(fs.r_mod_p))
    geo = info["geo"]
    folds = info["folds"]
    sq_norm = functools.partial(
        _fold_norm_multi, rho_limbs=rho_limbs, folds=folds["sq"]
    )
    if geo is None:
        conc_ints = tuple(
            tuple(tuple(int(v) for v in fs.int_to_mont_limbs(c)) for c in row)
            for row in cfg.concrete
        )
        groups = _mds_groups(L, t)
        G = len(groups)

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

    def concrete(sts):
        if geo is not None:
            return _scaled_concrete_multi(sts, geo, fs, rho_limbs, folds["conc"])
        news = [[None] * t for _ in range(ns)]
        for i in range(t):
            parts = [[] for _ in range(ns)]
            for js in groups:
                red = _redc_multi(
                    L,
                    [
                        _mds_row_cols(L, t, sts[s], conc_ints[i], js)
                        for s in range(ns)
                    ],
                    p_limbs,
                    n0inv,
                )
                for s in range(ns):
                    parts[s].append(red[s])
            if G == 1:
                for s in range(ns):
                    news[s][i] = parts[s][0]
            else:
                normed = _norm1_multi([_sum_limbs(parts[s]) for s in range(ns)])
                for s in range(ns):
                    news[s][i] = normed[s]
        return news

    def round_body(r, st4):
        sts = unpack_streams(st4)
        # --- Bars: from-mont REDC, canonicalize, chi, to-mont REDC ---
        flat = [sts[s][e] for s in range(ns) for e in range(u)]
        plain = _redc_multi(
            L, [_const_mul_cols(L, x, one_plain) for x in flat], p_limbs, n0inv
        )
        plain = _canon_multi(plain, p_limbs)
        plain = _bar_multi(plain, fs)
        barred = _redc_multi(
            L, [_const_mul_cols(L, x, r2_limbs) for x in plain], p_limbs, n0inv
        )
        for s in range(ns):
            for e in range(u):
                sts[s][e] = barred[s * u + e]
        # --- Bricks: x_i += x_{i-1}^2 on the post-bars values ---
        sq = _redc_multi(
            L,
            [_sqr_cols(L, sts[s][e]) for s in range(ns) for e in range(t - 1)],
            p_limbs,
            n0inv,
            final_norm=sq_norm,
        )
        added = [
            [a + b for a, b in zip(sts[s][i], sq[s * (t - 1) + i - 1])]
            for s in range(ns)
            for i in range(1, t)
        ]
        added = _fold_norm_multi(added, rho_limbs, folds["add"])
        for s in range(ns):
            for i in range(1, t):
                sts[s][i] = added[s * (t - 1) + i - 1]
        # --- Concrete + round constants (last row zeros) ---
        sts = concrete(sts)
        flat = [
            [sts[s][e][l] + rc_ref[r, e * L + l] for l in range(L)]
            for s in range(ns)
            for e in range(t)
        ]
        flat = _fold_norm_multi(flat, rho_limbs, folds["rc"])
        for s in range(ns):
            for e in range(t):
                sts[s][e] = flat[s * t + e]
        return pack_streams(sts)

    sts = unpack_streams(st4_init)
    st4 = pack_streams(concrete(sts))  # opening linear layer (normalized)

    st4 = jax.lax.fori_loop(0, cfg.rounds, round_body, st4)

    # Closing REDC by the Montgomery form of 1: restores the framework-wide
    # value < 2p output invariant (input < R => T < R*p => out < 2p).
    sts = unpack_streams(st4)
    reduced = _redc_multi(
        L,
        [
            _const_mul_cols(L, sts[s][e], one_mont)
            for s in range(ns)
            for e in range(t)
        ],
        p_limbs,
        n0inv,
    )
    for s in range(ns):
        for e in range(t):
            sts[s][e] = reduced[s * t + e]
    out_ref[:] = pack_streams(sts)


@functools.lru_cache(maxsize=None)
def monolith_kernel_fn(
    cfg: MonolithConfig,
    interpret: bool = False,
    sublanes: int = SUBLANES,
    lane_streams: int | None = None,
):
    """Jitted Monolith permutation: (t, L, B) -> (t, L, B), B % (sublanes*128) == 0."""
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
    check_kernel_bounds(cfg)  # raises for value-unsound configs
    fs = cfg.field
    L = fs.nlimbs
    t = cfg.t
    tile_lanes = sublanes * 128
    rc_np = monolith_rc_plane(cfg)  # (R, t*L), domain-matched to the kernel

    kernel = functools.partial(
        _monolith_kernel, cfg=cfg, lane_streams=lane_streams
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
            in_specs=[
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
                flops=cfg.rounds * (t + cfg.bars) * 12 * 2 * L * L * tile_lanes,
                bytes_accessed=2 * t * L * tile_lanes * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(jnp.asarray(rc_np), st4)
        return out.reshape(t, L, B)

    return run
