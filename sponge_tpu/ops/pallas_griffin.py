"""Fused Griffin-pi Pallas kernel: all rounds VMEM-resident, the one
wide-exponent ladder per round as a run-length square-and-multiply with the
lane-stream chains interleaved.

Griffin's round (griffin/permutation.py, ePrint 2022/403) is the cheapest
wide-exponent schedule of the ladder families — x^(1/d) on ONE element,
x^d on one, quadratic gates on the rest, then a small-integer linear
layer — but the XLA tier still streams the whole ``(t, L, B)`` state
through HBM for each of the ~2*log2(p) ladder products per round, and its
fixed-window ladder selects from a 16-entry power table with a dynamic
gather per digit.  This kernel applies the same two structural fixes as
the Rescue kernel (ops/pallas_rescue.py — see its docstring for the
falsified "no Pallas tier" analogy): the batch tile stays in VMEM for the
entire permutation, and the ladder is the run-length schedule
(``_exponent_runs``: exactly nbits-1 squarings + popcount-1 multiplies,
zero selects), with all ``lane_streams`` sub-tile chains interleaved per
emission.  Only the x0 ladder chain exists per stream — Griffin's ladder
phase is the least chain-parallel in the repo, so ``lane_streams`` (and
the optional wider ``sublanes=32, lane_streams=4`` shape) is the whole
interleave budget; the quadratic gates and the forward power map do
interleave across elements x streams.

The linear layer stays in the plain-integer domain exactly as the XLA
tier's: ``mat_e`` entries are small ints applied limb-wise with NO
Montgomery reduction, cleared by a single normalization pass (relaxed
1-pass budget: row_sum <= 24 keeps limbs < 2^19).

Value/limb discipline is the CIOS kernel's (products self-reduce; relaxed
chain-free norms keep limbs quasi-canonical).  Griffin values GROW through
the un-reduced linear layer (up to row_sum * the element bound), so
``_check_kernel_value_bounds`` iterates the worst-case fixpoint per config
and raises where R/p headroom cannot absorb it (small-headroom fields fall
back to the XLA tier, whose rho-folding discipline is exact up to R).

Exit: the closing Montgomery multiply by 1 (= REDC by R mod p) restores
canonical limbs and values < 2p, like the Rescue/GMiMC kernels.

Verified against the scalar oracle in-CI over a tiny field
(tests/test_griffin.py) and parity-gated on TPU by bench/families_probe.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..griffin.config import GriffinConfig
from ..ops import montgomery as mont
from .pallas_cios import (
    SUBLANES,
    _mul_cols,
    _norm1_multi,
    _pow_alpha_multi,
    _redc_multi,
    _relaxed_norm_multi,
    _sqr_cols,
)
from .pallas_rescue import (
    _exit_canonicalize,
    _exponent_runs,
    _ladder_runs_multi,
    _ladder_window_multi,
    _resolve_ladder_window,
    _resolve_streams,
    _window_schedule,
)


@functools.lru_cache(maxsize=None)
def _check_kernel_value_bounds(cfg: GriffinConfig, reduce_linear: bool) -> None:
    """Statically iterate worst-case element VALUES through the kernel's
    round schedule to a fixpoint; raise if any Montgomery-multiplier input
    could reach the radix R.

    Model: ``mul(a, b) <= a*b/R + p + 1`` (CIOS REDC output bound); the
    un-reduced linear layer scales the bound by its max row sum; the gate
    element L_i is bounded by ``(t-1)*y0 + y1 + x`` with y0, y1 multiplier
    outputs.  Unlike Rescue, the linear layer amplifies values without an
    intervening reduction, so wide states over modest R/p headroom (e.g.
    Goldilocks t=8: row_sum 48 vs R/p = 256) genuinely diverge —
    ``reduce_linear=True`` models the kernel's post-linear Montgomery-by-1
    reduction (values back < 2p at the cost of t*ns REDCs per round), which
    ``griffin_permute_fn`` enables automatically when the unreduced
    fixpoint fails."""
    fs = cfg.field
    p, R = fs.modulus, fs.r
    t = cfg.t
    row_sum = max(sum(row) for row in cfg.mat_e)

    def mul(a: int, b: int) -> int:
        if a >= R or b >= R:
            raise ValueError(
                f"Griffin fused-kernel value bound reaches R for t={t} over "
                f"{fs.name}; use the XLA tier (griffin/permutation.py)"
            )
        return (a * b) // R + p + 1

    def ladder(v: int) -> int:
        acc = v
        for _ in range(8):
            acc = max(mul(acc, acc), mul(mul(acc, acc), v))
        return acc

    def linear(v: int) -> int:
        v = row_sum * v + p  # un-reduced scaling + rc
        if v >= R:
            mul(R, R)  # raise with the standard message
        return mul(v, p) if reduce_linear else v

    V = linear(2 * p)  # entry contract through the initial linear layer
    for _ in range(cfg.rounds + 2):
        y0 = ladder(V)
        y1 = ladder(V)  # >= the short forward-alpha chain's fixpoint
        li = (t - 1) * y0 + y1 + V
        quad = mul(li, li) + mul(li, p) + p  # L^2 + alpha_i L + beta_i
        V = linear(max(y0, y1, mul(V, quad)))
    mul(V, p)  # exit multiply by the Montgomery form of 1


def _griffin_kernel(
    rc_ref, runs_ref, state_ref, out_ref, *, cfg, lane_streams, relaxed,
    reduce_linear=False, ladder_window=None,
):
    """Kernel body: (t, L, S, 128) VMEM tile through all rounds.

    ``rc_ref``: (rounds, t*L) SMEM Montgomery round constants (the last row
    all-zero, matching the XLA tier's uniform loop).
    ``runs_ref``: (n_runs,) SMEM squaring-run lengths of the inverse ladder.
    """
    fs = cfg.field
    L, t, ns = fs.nlimbs, cfg.t, lane_streams
    fc = mont.field_consts(fs)
    p_limbs = fc["p_tuple"]
    n0inv = int(fc["n0inv"])
    if relaxed:
        tail_norm = functools.partial(_relaxed_norm_multi, passes=2)
        small_norm = functools.partial(_relaxed_norm_multi, passes=1)
    else:
        tail_norm = None  # helpers default to the exact _norm1_multi
        small_norm = _norm1_multi
    mat_ints = tuple(tuple(int(v) for v in row) for row in cfg.mat_e)
    quads = tuple(
        (
            tuple(int(v) for v in fs.int_to_mont_limbs(cfg.quad_coeffs(i)[0])),
            tuple(int(v) for v in fs.int_to_mont_limbs(cfg.quad_coeffs(i)[1])),
        )
        for i in range(2, t)
    )
    if ladder_window is None:
        runs, trailing = _exponent_runs(cfg.inv_alpha)
        n_runs = len(runs)
    else:
        lead_digit, digits = _window_schedule(cfg.inv_alpha, ladder_window)
        n_steps = len(digits)
    one_ints = tuple(int(v) for v in fs.int_to_limbs(fs.r_mod_p))

    st4 = state_ref[:]
    S = st4.shape[2]
    h = S // ns

    def unpack(st4):
        """(t, L, S, 128) -> per-stream element lists sts[s][e][l]."""
        return [
            [[st4[e, l, s * h : (s + 1) * h] for l in range(L)] for e in range(t)]
            for s in range(ns)
        ]

    def pack(sts):
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

    def linear(sts, r=None):
        """Un-reduced small-int linear layer (+ rc[r] when given), one
        normalization pass: limbs <= row_sum * QUASI + 2^12 < 2^19."""
        combined = []
        for s in range(ns):
            for i in range(t):
                acc = None
                for j in range(t):
                    e = mat_ints[i][j]
                    if e == 0:
                        continue
                    term = (
                        sts[s][j]
                        if e == 1
                        else [l_ * e for l_ in sts[s][j]]
                    )
                    acc = (
                        term
                        if acc is None
                        else [a + b for a, b in zip(acc, term)]
                    )
                if r is not None:
                    acc = [
                        v + rc_ref[r, i * L + l] for l, v in enumerate(acc)
                    ]
                combined.append(acc)
        normed = small_norm(combined)
        if reduce_linear:
            # Bring values back < 2p with one Montgomery-by-1 multiply per
            # element (enabled when the unreduced fixpoint would reach R —
            # e.g. Goldilocks t=8; see _check_kernel_value_bounds).
            one_b = [jnp.full_like(normed[0][0], one_ints[l]) for l in range(L)]
            normed = _redc_multi(
                L,
                [_mul_cols(L, x, one_b) for x in normed],
                p_limbs,
                n0inv,
                tail_norm,
            )
        return [
            [normed[s * t + i] for i in range(t)] for s in range(ns)
        ]

    def nonlinear(sts):
        # y0 = x0^(1/d): ns interleaved ladder chains (the round's long pole).
        x0s = [sts[s][0] for s in range(ns)]
        if ladder_window is None:
            y0s = _ladder_runs_multi(
                L, x0s, x0s, runs_ref, n_runs, trailing, p_limbs, n0inv,
                tail_norm,
            )
        else:
            y0s = _ladder_window_multi(
                L, x0s, x0s, runs_ref, n_steps, lead_digit, p_limbs, n0inv,
                tail_norm, ladder_window, one_ints=one_ints,
            )
        # y1 = x1^d: short forward chains, all streams interleaved.
        y1s = _pow_alpha_multi(
            L, [sts[s][1] for s in range(ns)], cfg.alpha, p_limbs, n0inv,
            tail_norm,
        )
        for s in range(ns):
            sts[s][0] = y0s[s]
            sts[s][1] = y1s[s]
        if t == 2:
            return sts
        # Quadratic gates: L_i = (i-1)*y0 + y1 (+ x_{i-1} for i >= 3),
        # quad = L^2 + alpha_i*L + beta_i, out_i = x_i * quad — the sq and
        # alpha_i products of ALL (i, s) are mutually independent (one
        # interleaved emission), then the (t-2)*ns gate multiplies likewise.
        lis = []
        for s in range(ns):
            for i in range(2, t):
                li = [
                    (i - 1) * a + b for a, b in zip(y0s[s], y1s[s])
                ]
                if i >= 3:
                    li = [a + b for a, b in zip(li, sts[s][i - 1])]
                lis.append(li)
        lis = small_norm(lis)
        m = t - 2
        red = _redc_multi(
            L,
            [_sqr_cols(L, li) for li in lis]
            + [
                _mul_cols(
                    L,
                    lis[s * m + (i - 2)],
                    [jnp.full_like(lis[0][0], quads[i - 2][0][l]) for l in range(L)],
                )
                for s in range(ns)
                for i in range(2, t)
            ],
            p_limbs,
            n0inv,
            tail_norm,
        )
        quad_sums = small_norm(
            [
                [
                    sq + al + quads[i - 2][1][l]
                    for l, (sq, al) in enumerate(
                        zip(red[s * m + (i - 2)], red[(ns + s) * m + (i - 2)])
                    )
                ]
                for s in range(ns)
                for i in range(2, t)
            ]
        )
        gated = _redc_multi(
            L,
            [
                _mul_cols(L, sts[s][i], quad_sums[s * m + (i - 2)])
                for s in range(ns)
                for i in range(2, t)
            ],
            p_limbs,
            n0inv,
            tail_norm,
        )
        for s in range(ns):
            for i in range(2, t):
                sts[s][i] = gated[s * m + (i - 2)]
        return sts

    def round_body(r, sts):
        # Loop carry is the nested per-stream pytree — packing the t*L
        # (h, 128) tiles into one tensor per round would copy more than
        # the cheap schedule points compute (see pallas_rescue).
        sts = nonlinear(sts)
        sts = linear(sts, r)
        return sts

    sts = linear(unpack(st4))  # initial linear layer (no rc)
    sts = jax.lax.fori_loop(0, cfg.rounds, round_body, sts)

    # Shared exit: exact norm + Montgomery-by-1 (values < R by the gate).
    flat = _exit_canonicalize(
        L, [sts[s][e] for s in range(ns) for e in range(t)], fs, p_limbs,
        n0inv,
    )
    for s in range(ns):
        for e in range(t):
            sts[s][e] = flat[s * t + e]
    out_ref[:] = pack(sts)


@functools.lru_cache(maxsize=None)
def griffin_permute_fn(
    cfg: GriffinConfig,
    interpret: bool = False,
    sublanes: int = SUBLANES,
    lane_streams: int | None = None,
    relaxed: bool = True,
    ladder_window: int | None | str = "auto",
):
    """Jitted fused Griffin-pi permutation: (t, L, B) -> (t, L, B),
    B % (sublanes*128) == 0.  The post-linear reduction is enabled
    automatically when the unreduced value fixpoint would reach R; raises
    when even the reduced schedule fails (use the XLA tier then).
    ``ladder_window`` / ``lane_streams`` resolve through the shared family
    policies (pallas_rescue).  Default tile stays 16 sublanes / 2 streams:
    unlike Rescue/Anemoi (whose 8:1 tiles won), Griffin's ladder chains
    come ONLY from the stream split, and 8:1 measured a loss (642,545 vs
    652,698/687,201 perms/s BLS rate-2, order-controlled)."""
    if cfg.field.limb_bits != 12:
        # This family's kernel bound analysis (fold counts, row-sum budgets,
        # quasi ranges) is derived for the 12-bit limb plan; the 13-bit plan
        # (DESIGN S25) is currently wired through the Poseidon CIOS kernel
        # only.  Fail loudly rather than mask with a wrong limb width.
        raise ValueError(
            f"{cfg.field.name}: limb_bits={cfg.field.limb_bits} is not "
            "supported by this family kernel (12-bit plan only)"
        )
    try:
        _check_kernel_value_bounds(cfg, False)
        reduce_linear = False
    except ValueError:
        _check_kernel_value_bounds(cfg, True)
        reduce_linear = True
    ladder_window = _resolve_ladder_window(cfg, ladder_window)
    lane_streams = _resolve_streams(sublanes, lane_streams)
    fs = cfg.field
    L, t = fs.nlimbs, cfg.t
    tile_lanes = sublanes * 128
    zero_row = tuple(0 for _ in range(t))
    rc_np = np.stack(
        [
            np.concatenate([fs.int_to_mont_limbs(c) for c in row])
            for row in tuple(cfg.rc) + (zero_row,)
        ]
    ).astype(np.int32)
    if ladder_window is None:
        runs, _trailing = _exponent_runs(cfg.inv_alpha)
        runs_np = np.asarray(runs, dtype=np.int32)
    else:
        _lead, digits = _window_schedule(cfg.inv_alpha, ladder_window)
        runs_np = np.asarray(digits, dtype=np.int32)

    kernel = functools.partial(
        _griffin_kernel, cfg=cfg, lane_streams=lane_streams, relaxed=relaxed,
        reduce_linear=reduce_linear, ladder_window=ladder_window,
    )
    nbits = cfg.inv_alpha.bit_length()
    n_muls = len(runs_np) + (0 if ladder_window is None else (1 << ladder_window))
    products_per_round = nbits + n_muls + 3 * (t - 2) + 4

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
                (t, L, sublanes, 128),
                lambda i: (0, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            cost_estimate=pl.CostEstimate(
                flops=cfg.rounds * products_per_round * 2 * L * L * tile_lanes,
                bytes_accessed=2 * t * L * tile_lanes * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(jnp.asarray(rc_np), jnp.asarray(runs_np), st4)
        return out.reshape(t, L, B)

    return run
