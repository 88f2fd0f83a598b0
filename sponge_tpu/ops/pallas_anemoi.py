"""Fused Anemoi Pallas kernel: all rounds VMEM-resident, the per-round
x^(1/alpha) ladder over ALL l Flystel pairs (x lane streams) interleaved.

Anemoi (ePrint 2022/840) is the most chain-parallel ladder family: the open
Flystel's inverse power map applies to every one of the l = t/2 columns each
round, so the kernel interleaves ``l * lane_streams`` independent REDC
chains per ladder emission — better latency hiding than Rescue (t chains)
or Griffin (1 chain) at the same stream count.  The same two structural
fixes as the Rescue kernel apply (ops/pallas_rescue.py: VMEM residency for
the whole permutation; the run-length square-and-multiply schedule with
zero table selects — see that docstring for the falsified "no Pallas tier"
analogy).

Subtraction discipline: the limb planes are unsigned-redundant, so the
kernel keeps the XLA tier's negated-constant form (anemoi/permutation.py):
``-g*y^2`` is one constant multiply by Montgomery(-g), and the dynamic
subtrahend in ``v = y - u^(1/alpha)`` negates via one multiply by
Montgomery(-1) — every REDC output is a proper field value, no borrows.

Value/limb discipline is the CIOS kernel's (self-reducing products, relaxed
chain-free norms); the PHT adds and the l-term diffusion row sums grow
values additively, so ``_check_kernel_value_bounds`` iterates the worst-case
round fixpoint per config and raises where R/p headroom cannot absorb it
(wide states over 31-bit fields fall back to the value-safe XLA tier).

Exit: the closing diffusion layer, one exact interleaved norm, and one
Montgomery multiply by 1 (= REDC by R mod p) restore the framework-wide
output contract (canonical limbs, values < 2p).

Verified against the scalar oracle in-CI over a tiny field
(tests/test_anemoi.py) and parity-gated on TPU by bench/families_probe.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..anemoi.config import AnemoiConfig
from ..ops import montgomery as mont
from .pallas_cios import (
    SUBLANES,
    _mds_groups,
    _mds_row_cols,
    _mul_cols,
    _norm1_multi,
    _redc_multi,
    _relaxed_norm_multi,
    _sqr_cols,
    _sum_limbs,
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
def _check_kernel_value_bounds(cfg: AnemoiConfig, reduce_pht: bool = False) -> None:
    """Statically iterate worst-case element VALUES through the kernel's
    round schedule to a fixpoint; raise if any Montgomery-multiplier input
    or diffusion-row sum could reach the radix R.

    Model: ``mul(a, b) <= a*b/R + p + 1``; a diffusion row sums ceil(l/g)
    lazily-grouped REDC outputs of constant products (constants canonical);
    the PHT adds stack two row outputs; the Flystel u/v/w combinations add
    reduced products plus constants.  31-bit fields at wide l genuinely
    fail — ``batched_anemoi_permute`` falls back to the value-safe XLA
    tier then.

    ``reduce_pht=True`` models the kernel's post-PHT Montgomery-by-1
    reduction (Griffin's reduce_linear pattern): at l = 1 the diffusion
    matrix is the identity — NO REDC-bounded product between the PHT adds —
    so values grow Fibonacci-style round over round and the unreduced
    fixpoint diverges on any long schedule (e.g. the t = 2 Jive_2 width
    over 255-bit fields, 21 rounds).  The reduction (2*l*ns REDCs/round,
    <1% of the ladder's products) restores values < 2p after every PHT;
    ``anemoi_permute_fn`` enables it automatically when the unreduced
    fixpoint fails."""
    fs = cfg.field
    p, R = fs.modulus, fs.r
    lcol = cfg.l
    # quasi=True: the relaxed kernel's grouping (more groups at tight limb
    # budgets) is the worst case for the modeled per-row sum.
    groups = _mds_groups(fs.nlimbs, lcol, quasi=True)
    g = max(len(js) for js in groups)

    def mul(a: int, b: int) -> int:
        if a >= R or b >= R:
            raise ValueError(
                f"Anemoi fused-kernel value bound reaches R for l={lcol} "
                f"over {fs.name}; use the XLA tier (anemoi/permutation.py)"
            )
        return (a * b) // R + p + 1

    def ladder(v: int) -> int:
        acc = v
        for _ in range(8):
            acc = max(mul(acc, acc), mul(mul(acc, acc), v))
        return acc

    def mat_row(v: int) -> int:
        if v >= R:
            mul(R, R)  # the diffusion products multiply v: raise like mul
        if lcol == 1:
            return v
        return len(groups) * ((g * v * p) // R + p + 1)

    Vx = Vy = 2 * p  # entry contract
    for _ in range(cfg.rounds + 2):
        Vx, Vy = Vx + p, Vy + p  # rc adds
        Vx, Vy = mat_row(Vx), mat_row(Vy)
        Vy = Vy + Vx  # PHT
        Vx = Vx + Vy
        if max(Vx, Vy) >= R:
            mul(R, R)  # raise with the standard message
        if reduce_pht:
            Vx, Vy = mul(Vx, p), mul(Vy, p)
        u = Vx + mul(mul(Vy, Vy), p) + p  # x + (-g)*y^2 + (-g^-1)
        lad = ladder(u)
        v = Vy + mul(lad, p)  # y + (-1)*lad
        w = u + mul(mul(v, v), p)  # u + g*v^2
        Vx, Vy = w, v
    # closing diffusion + exit multiply by the Montgomery form of 1
    Vx, Vy = mat_row(Vx), mat_row(Vy)
    Vy = Vy + Vx
    Vx = Vx + Vy
    if reduce_pht:
        Vx, Vy = mul(Vx, p), mul(Vy, p)
    mul(max(Vx, Vy), p)


def _anemoi_kernel(
    rc_ref, runs_ref, state_ref, out_ref, *, cfg, lane_streams, relaxed,
    ladder_window=None, reduce_pht=False,
):
    """Kernel body: (t, L, S, 128) VMEM tile through all rounds; elements
    0..l-1 are the X column, l..2l-1 the Y column.

    ``rc_ref``: (rounds, 2*l*L) SMEM Montgomery round constants (X rows
    first, then Y).
    ``runs_ref``: (n_runs,) SMEM squaring-run lengths of the inverse ladder.
    """
    fs = cfg.field
    L, lcol, ns = fs.nlimbs, cfg.l, lane_streams
    p = fs.modulus
    fc = mont.field_consts(fs)
    p_limbs = fc["p_tuple"]
    n0inv = int(fc["n0inv"])
    if relaxed:
        tail_norm = functools.partial(_relaxed_norm_multi, passes=2)
        small_norm = functools.partial(_relaxed_norm_multi, passes=1)
    else:
        tail_norm = None  # helpers default to the exact _norm1_multi
        small_norm = _norm1_multi
    groups = _mds_groups(L, lcol, quasi=relaxed)
    mat_ints = tuple(
        tuple(tuple(int(v) for v in fs.int_to_mont_limbs(c)) for c in row)
        for row in cfg.mat_x
    )
    const = {
        name: tuple(int(v) for v in fs.int_to_mont_limbs(val % p))
        for name, val in (
            ("g", cfg.g),
            ("neg_g", -cfg.g),
            ("neg_ginv", -cfg.g_inv),
            ("neg_one", -1),
            ("one", 1),
        )
    }
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
    C = lcol * ns  # interleaved chains per emission, index c = s * lcol + k

    def unpack(st4):
        """-> (xs, ys): each C chains of L (h, 128) limbs."""
        xs = [
            [st4[k, l, s * h : (s + 1) * h] for l in range(L)]
            for s in range(ns)
            for k in range(lcol)
        ]
        ys = [
            [st4[lcol + k, l, s * h : (s + 1) * h] for l in range(L)]
            for s in range(ns)
            for k in range(lcol)
        ]
        return xs, ys

    def pack(xs, ys):
        elems = []
        for k in range(lcol):
            elems.append(
                jnp.stack(
                    [
                        jnp.concatenate(
                            [xs[s * lcol + k][l] for s in range(ns)], axis=0
                        )
                        for l in range(L)
                    ]
                )
            )
        for k in range(lcol):
            elems.append(
                jnp.stack(
                    [
                        jnp.concatenate(
                            [ys[s * lcol + k][l] for s in range(ns)], axis=0
                        )
                        for l in range(L)
                    ]
                )
            )
        return jnp.stack(elems)

    def cmul(chains, cname):
        """Constant multiply of every chain by a Montgomery constant."""
        cl = const[cname]
        cb = [jnp.full_like(chains[0][0], cl[l]) for l in range(L)]
        return _redc_multi(
            L,
            [_mul_cols(L, ch, cb) for ch in chains],
            p_limbs,
            n0inv,
            tail_norm,
        )

    def sqr(chains):
        return _redc_multi(
            L, [_sqr_cols(L, ch) for ch in chains], p_limbs, n0inv, tail_norm
        )

    def mat_apply(chains):
        """M_x on each stream's l-column (lazy grouped const products,
        all rows x streams interleaved)."""
        if lcol == 1:
            return chains
        parts = [[] for _ in range(C)]
        for js in groups:
            red = _redc_multi(
                L,
                [
                    _mds_row_cols(
                        L, lcol, chains[s * lcol : (s + 1) * lcol],
                        mat_ints[i], js,
                    )
                    for s in range(ns)
                    for i in range(lcol)
                ],
                p_limbs,
                n0inv,
                tail_norm,
            )
            for c in range(C):
                parts[c].append(red[c])
        if len(groups) == 1:
            return [pr[0] for pr in parts]
        return small_norm([_sum_limbs(pr) for pr in parts])

    def diffusion(xs, ys):
        xs = mat_apply(xs)
        if lcol > 1:
            ys = [
                ys[s * lcol + (k + 1) % lcol]
                for s in range(ns)
                for k in range(lcol)
            ]  # rot-left-1 per stream
        ys = mat_apply(ys)
        ys = small_norm(
            [[a + b for a, b in zip(y, x)] for y, x in zip(ys, xs)]
        )
        xs = small_norm(
            [[a + b for a, b in zip(x, y)] for x, y in zip(xs, ys)]
        )
        if reduce_pht:
            # Bring values back < 2p with one Montgomery-by-1 multiply per
            # element, all 2*C chains in one interleaved emission (enabled
            # when the unreduced fixpoint would reach R — e.g. the l = 1
            # identity-diffusion widths; see _check_kernel_value_bounds).
            both = cmul(xs + ys, "one")
            xs, ys = both[:C], both[C:]
        return xs, ys

    def flystel(xs, ys):
        # u = x + (-g)*y^2 + (-g^-1)
        neg_gsq = cmul(sqr(ys), "neg_g")
        u = small_norm(
            [
                [
                    a + b + const["neg_ginv"][l]
                    for l, (a, b) in enumerate(zip(x, q))
                ]
                for x, q in zip(xs, neg_gsq)
            ]
        )
        # v = y - u^(1/alpha), negation via one multiply by Montgomery(-1)
        if ladder_window is None:
            lad = _ladder_runs_multi(
                L, u, u, runs_ref, n_runs, trailing, p_limbs, n0inv, tail_norm
            )
        else:
            lad = _ladder_window_multi(
                L, u, u, runs_ref, n_steps, lead_digit, p_limbs, n0inv,
                tail_norm, ladder_window, one_ints=one_ints,
            )
        neg_lad = cmul(lad, "neg_one")
        v = small_norm(
            [[a + b for a, b in zip(y, nl)] for y, nl in zip(ys, neg_lad)]
        )
        # w = u + g*v^2
        gv2 = cmul(sqr(v), "g")
        w = small_norm(
            [[a + b for a, b in zip(uu, q)] for uu, q in zip(u, gv2)]
        )
        return w, v

    def round_body(r, carry):
        # Loop carry is the (xs, ys) chains pytree — packing the t*L
        # (h, 128) tiles into one tensor per round would copy more than the
        # cheap schedule points compute (see pallas_rescue).
        xs, ys = carry
        xs = small_norm(
            [
                [
                    v + rc_ref[r, (c % lcol) * L + l]
                    for l, v in enumerate(xs[c])
                ]
                for c in range(C)
            ]
        )
        ys = small_norm(
            [
                [
                    v + rc_ref[r, (lcol + (c % lcol)) * L + l]
                    for l, v in enumerate(ys[c])
                ]
                for c in range(C)
            ]
        )
        xs, ys = diffusion(xs, ys)
        xs, ys = flystel(xs, ys)
        return xs, ys

    xs, ys = jax.lax.fori_loop(0, cfg.rounds, round_body, unpack(st4))

    # Closing diffusion, exact norm (values < R by the build-time check),
    # one Montgomery multiply by 1: canonical limbs, values < 2p.
    xs, ys = diffusion(xs, ys)
    flat = _exit_canonicalize(L, xs + ys, fs, p_limbs, n0inv)
    out_ref[:] = pack(flat[:C], flat[C:])


@functools.lru_cache(maxsize=None)
def anemoi_permute_fn(
    cfg: AnemoiConfig,
    interpret: bool = False,
    sublanes: int | None = None,
    lane_streams: int | None = None,
    relaxed: bool = True,
    ladder_window: int | None | str = "auto",
):
    """Jitted fused Anemoi permutation: (t, L, B) -> (t, L, B),
    B % (sublanes*128) == 0.  The post-PHT reduction is enabled
    automatically when the unreduced value fixpoint would reach R (the
    l = 1 identity-diffusion widths, e.g. the t = 2 Jive_2 config);
    raises when even the reduced schedule fails (use the XLA tier then).
    ``ladder_window`` / ``lane_streams`` resolve through the shared family
    policies (pallas_rescue).  Default tile: 8 sublanes, 1 stream at
    l >= 2 — measured +7% over 16:2 (286,113 vs 267,317/267,434 perms/s
    BLS rate-3, order-controlled; the l-pair chains already interleave
    without the stream split, and the smaller VMEM live set wins) — but
    16 sublanes / 2 streams at l = 1 (the t = 2 Jive width): with a single
    Flystel column the ladder carries ONE chain per stream, Griffin's
    regime, and 16:2 measured +7% (380,932 vs 356,358/252,946 perms/s BLS
    t=2, order-controlled; bench/jive_tile_probe.py)."""
    if cfg.field.limb_bits != 12:
        # This family's kernel bound analysis (fold counts, row-sum budgets,
        # quasi ranges) is derived for the 12-bit limb plan; the 13-bit plan
        # (DESIGN S25) is currently wired through the Poseidon CIOS kernel
        # only.  Fail loudly rather than mask with a wrong limb width.
        raise ValueError(
            f"{cfg.field.name}: limb_bits={cfg.field.limb_bits} is not "
            "supported by this family kernel (12-bit plan only)"
        )
    if sublanes is None:
        sublanes = 16 if cfg.l == 1 else 8
    try:
        _check_kernel_value_bounds(cfg, False)
        reduce_pht = False
    except ValueError:
        _check_kernel_value_bounds(cfg, True)
        reduce_pht = True
    ladder_window = _resolve_ladder_window(cfg, ladder_window)
    lane_streams = _resolve_streams(sublanes, lane_streams)
    fs = cfg.field
    L, t, lcol = fs.nlimbs, cfg.t, cfg.l
    tile_lanes = sublanes * 128
    rc_np = np.stack(
        [
            np.concatenate(
                [fs.int_to_mont_limbs(c) for c in rx]
                + [fs.int_to_mont_limbs(c) for c in ry]
            )
            for rx, ry in zip(cfg.rc_x, cfg.rc_y)
        ]
    ).astype(np.int32)
    if ladder_window is None:
        runs, _trailing = _exponent_runs(cfg.inv_alpha)
        runs_np = np.asarray(runs, dtype=np.int32)
    else:
        _lead, digits = _window_schedule(cfg.inv_alpha, ladder_window)
        runs_np = np.asarray(digits, dtype=np.int32)

    kernel = functools.partial(
        _anemoi_kernel, cfg=cfg, lane_streams=lane_streams, relaxed=relaxed,
        ladder_window=ladder_window, reduce_pht=reduce_pht,
    )
    nbits = cfg.inv_alpha.bit_length()
    n_muls = len(runs_np) + (0 if ladder_window is None else (1 << ladder_window))
    products_per_round = lcol * (nbits + n_muls + 5) + 2 * lcol * lcol

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
