"""Fused Rescue-Prime Pallas kernel: all N rounds VMEM-resident, the inverse
S-box as a run-length square-and-multiply ladder with every state chain
interleaved.

Why a kernel exists for this family after DESIGN.md §19 said "no Pallas
tier": that section's reasoning was an ANALOGY to the Poseidon §8
measurement, and the fused GMiMC kernel falsified the analogy (35x its XLA
tier, BENCHMARKS.md).  The XLA ladder tier (rescue/permutation.py
``pow_ladder``) pays three costs the kernel structurally removes:

* every one of the ~2*log2(p) Montgomery products per round streams the
  whole ``(t, L, B)`` state through HBM (XLA fuses elementwise chains, but
  the ``fori_loop``-of-digits boundary plus the 16-entry power table
  materialize round trips) — the kernel keeps the batch tile in VMEM for
  the entire permutation;
* the XLA window ladder's table select is a **dynamic gather** over a
  ``(16, t, L, B)`` HBM tensor per digit — the kernel has two gather-free
  schedules, both decomposed statically at build time into SMEM arrays:
  the run-length ladder (``_exponent_runs``: exactly nbits-1 squarings +
  popcount-1 multiplies, zero selects — the Hamming-weight optimum for a
  left-to-right binary ladder) and the fixed-window ladder
  (``_window_schedule``: w unrolled squarings + one masked select-sum
  table multiply per step — fewer loop-carry round trips per product,
  measured +20% on the 255-bit exponent: 195,537 vs 162,959 perms/s, so
  ``ladder_window="auto"`` picks it for exponents >= 96 bits);
* a single ladder chain is REDC-latency-bound; the kernel interleaves all
  ``t * lane_streams`` element chains per emission (``_redc_multi``), the
  same trace-level software pipelining the Poseidon CIOS kernel uses.

Round structure (rescue/permutation.py, ePrint 2020/1143):

    state <- MDS . state^alpha      + rc[2r]
    state <- MDS . state^(1/alpha)  + rc[2r+1]

Value/limb discipline is the CIOS kernel's: Montgomery products are
self-reducing, MDS rows use lazy grouped column accumulation
(``_mds_groups``), and ``relaxed=True`` substitutes chain-free
epsilon-redundant normalization (quasi-canonical limbs <= 2^12 + 128)
everywhere except the exit.  ``_check_kernel_value_bounds`` statically
iterates worst-case VALUES through the full round fixpoint and raises when
any multiplier input or MDS sum could reach the Montgomery radix R —
every shipped (field, rate) default passes; ``batched_rescue_permute``
falls back to the XLA tier when it does not.

Exit: one exact interleaved norm plus one Montgomery multiply by 1
(= REDC by R mod p) restores the framework-wide output contract
(canonical limbs, values < 2p) — same closing as the GMiMC kernel.

Verified against the scalar oracle in-CI over a tiny field
(tests/test_rescue.py) and parity-gated on TPU by bench/rescue_probe.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import montgomery as mont
from ..rescue.config import RescueConfig
from .pallas_cios import (
    SUBLANES,
    _mds_groups,
    _mds_row_cols,
    _mul_cols,
    _norm1_multi,
    _redc_multi,
    _pow_alpha_multi,
    _relaxed_norm_multi,
    _sqr_cols,
    _sum_limbs,
)


def _resolve_ladder_window(cfg, ladder_window):
    """Resolve the shared ``ladder_window="auto"`` policy for the ladder
    families: the fixed-window ladder pays its 2^w-entry table build + the
    per-step masked selects only over long exponents — +20% on the 255-bit
    BLS12-381 inverse exponent (w=4: 195,537 vs 162,959 perms/s,
    bench/rescue_probe.py), neutral at 64 bits (DESIGN.md §22) — so "auto"
    is w=4 for exponents >= 96 bits and the run-length schedule otherwise."""
    if ladder_window == "auto":
        return 4 if cfg.inv_alpha.bit_length() >= 96 else None
    return ladder_window


def _resolve_streams(sublanes, lane_streams):
    """Shared lane-stream defaulting/validation for the fused kernels."""
    if lane_streams is None:
        lane_streams = 2 if sublanes % 16 == 0 else 1
    if lane_streams > 1 and sublanes % (8 * lane_streams) != 0:
        raise ValueError(
            f"lane_streams={lane_streams} needs sublanes divisible by "
            f"{8 * lane_streams} (got {sublanes})"
        )
    return lane_streams


def _exit_canonicalize(L, chains, fs, p_limbs, n0inv):
    """Shared kernel exit: one exact interleaved norm (caller guarantees
    values < R, so the dropped top carry is provably zero) plus one
    Montgomery multiply by 1 (= REDC by R mod p), restoring the
    framework-wide output contract — canonical limbs, values < 2p."""
    chains = _norm1_multi(chains)
    one_ints = tuple(int(v) for v in fs.int_to_limbs(fs.r_mod_p))
    one_b = [jnp.full_like(chains[0][0], one_ints[l]) for l in range(L)]
    return _redc_multi(
        L, [_mul_cols(L, x, one_b) for x in chains], p_limbs, n0inv
    )


def _ladder_runs_multi(
    L, chains, base, runs_ref, n_runs, trailing, p_limbs, n0inv, tail_norm
):
    """x^e on several independent limb-list chains via the run-length
    square-and-multiply ladder, all chains interleaved per emission.

    ``runs_ref``: SMEM int32 array of squaring-run lengths (from
    ``_exponent_runs``); ``base`` is the multiply operand (normally
    ``chains`` itself — x^e of each chain's own input).  The run lengths
    are streamed from SMEM so the device loop body stays one interleaved
    squaring (plus one multiply per run boundary) instead of an unrolled
    ~log2(e)-step trace.  The loop carry is the chains PYTREE itself
    (list-of-limb-lists) — packing the ~C*L small (h, 128) tiles into one
    stacked tensor per iteration would copy ~20x more elements than the
    iteration's arithmetic touches.  Shared by the Rescue, Griffin, and
    Anemoi fused kernels."""

    def sqr_all(cs):
        return _redc_multi(
            L, [_sqr_cols(L, ch) for ch in cs], p_limbs, n0inv, tail_norm
        )

    def sqr_body(_, cs):
        return sqr_all(cs)

    def run_body(i, cs):
        cs = jax.lax.fori_loop(0, runs_ref[i], sqr_body, cs)
        return _redc_multi(
            L,
            [_mul_cols(L, a, x) for a, x in zip(cs, base)],
            p_limbs,
            n0inv,
            tail_norm,
        )

    chains = jax.lax.fori_loop(0, n_runs, run_body, [list(c) for c in chains])
    for _ in range(trailing):  # 0 for every odd exponent (all inv_alphas)
        chains = sqr_all(chains)
    return chains


def _window_schedule(exponent: int, w: int = 3) -> tuple[int, list[int]]:
    """FIXED-window decomposition of an MSB-first ladder.

    Returns ``(lead_digit, digits)``: seed ``acc = x^lead_digit``, then for
    each digit ``d`` perform exactly ``w`` squarings and one multiply by
    ``x^d`` (``d`` may be 0 — the table's x^0 entry is the Montgomery form
    of 1, a value-preserving multiply — so the loop body has NO dynamic
    trip counts or conditionals at all).  vs the run-length ladder
    (~2*nbits/1.5 products, one loop-carry round trip per product), the
    fixed window trades ~6% wasted multiplies and a 2^w-entry power table
    for a loop body of w+1 products per carry — the loop-carry VMEM
    traffic, not the arithmetic, is what the body amortizes."""
    bits = bin(exponent)[2:]
    rem = len(bits) % w or w
    lead = int(bits[:rem], 2)
    digits = [
        int(bits[i : i + w], 2) for i in range(rem, len(bits), w)
    ]
    return lead, digits


def _ladder_window_multi(
    L, chains, base, digits_ref, n_steps, lead_digit,
    p_limbs, n0inv, tail_norm, w=3, one_ints=None,
):
    """x^e on several independent limb-list chains via the fixed-window
    schedule (``_window_schedule``), all chains interleaved per emission.

    ``digits_ref``: (n_steps,) SMEM int32 digit values.  The 2^w-entry
    power table of each chain (x^0 = Montgomery 1, x^1 = base, ...) is
    selected per step with a masked select-sum over the entries (Mosaic has
    no dynamic_slice of VMEM *values*, and the 2^w where-selects per limb
    cost ~4% of the step's products); the loop body is ``w`` UNROLLED
    interleaved squarings plus one table multiply — w+1 products per
    loop-carry round trip.  Loop carries are the chains pytree (see
    _ladder_runs_multi)."""
    C = len(chains)
    n_entries = 1 << w

    one_b = [jnp.full_like(base[0][0], one_ints[l]) for l in range(L)]
    entries = [[list(one_b) for _ in range(C)], list(base)]
    for _ in range(n_entries - 2):
        entries.append(
            _redc_multi(
                L,
                [_mul_cols(L, e, x) for e, x in zip(entries[-1], base)],
                p_limbs,
                n0inv,
                tail_norm,
            )
        )

    def sqr_all(cs):
        return _redc_multi(
            L, [_sqr_cols(L, ch) for ch in cs], p_limbs, n0inv, tail_norm
        )

    def step_body(i, cs):
        for _ in range(w):  # unrolled: no inner loop carry
            cs = sqr_all(cs)
        d = digits_ref[i]
        ents = [
            [
                sum(
                    jnp.where(d == k, entries[k][c][l], 0)
                    for k in range(n_entries)
                )
                for l in range(L)
            ]
            for c in range(C)
        ]
        return _redc_multi(
            L,
            [_mul_cols(L, a, e) for a, e in zip(cs, ents)],
            p_limbs,
            n0inv,
            tail_norm,
        )

    acc = [list(ch) for ch in entries[lead_digit]]
    return jax.lax.fori_loop(0, n_steps, step_body, acc)


def _exponent_runs(exponent: int) -> tuple[list[int], int]:
    """Run-length schedule of an MSB-first square-and-multiply ladder.

    Returns ``(runs, trailing)``: after seeding ``acc = x`` from the leading
    1-bit, the ladder performs, for each entry ``g`` in ``runs``, ``g``
    squarings followed by one multiply-by-x; then ``trailing`` final
    squarings (0 whenever the exponent is odd — always the case for
    ``inv_alpha``, since alpha * inv_alpha = 1 mod the even p-1)."""
    bits = bin(exponent)[2:]
    runs: list[int] = []
    gap = 0
    for b in bits[1:]:
        gap += 1
        if b == "1":
            runs.append(gap)
            gap = 0
    return runs, gap


@functools.lru_cache(maxsize=None)
def _check_kernel_value_bounds(cfg: RescueConfig) -> None:
    """Statically iterate worst-case element VALUES through the kernel's
    round schedule to a fixpoint; raise if any Montgomery-multiplier input
    or lazily-grouped MDS sum could reach the radix R.

    Model (conservative): ``mul(a, b) <= a*b/R + p + 1`` (CIOS REDC output
    bound); a group REDC over ``g`` accumulated products of values <= V
    against canonical constants <= p is ``g*V*p/R + p + 1``; the per-row MDS
    output sums ``ceil(t/g)`` reduced groups plus one canonical constant.
    The ladder bound is the fixpoint of alternating squares and
    multiplies-by-base (base = the ladder input).

    Note: ``FieldSpec`` pads limb counts so R >= 16p for every constructible
    field, under which this fixpoint provably converges (mul contracts for
    values in (1.07p, 14.9p) at R = 16p, and the grouped MDS sums stay
    inside that window for every g from ``_mds_groups``) — so every shipped
    config passes.  The check is kept as executable documentation of the
    discipline and as a guard for hypothetical future limb layouts."""
    fs = cfg.field
    p, R = fs.modulus, fs.r
    t = cfg.t
    # quasi=True: the relaxed kernel's grouping (more groups at tight limb
    # budgets) is the worst case for the modeled per-row sum.
    groups = _mds_groups(fs.nlimbs, t, quasi=True)
    g = max(len(js) for js in groups)

    def mul(a: int, b: int) -> int:
        if a >= R or b >= R:
            raise ValueError(
                f"Rescue fused-kernel value bound reaches R for t={t} over "
                f"{fs.name}; use the XLA tier (rescue/permutation.py)"
            )
        return (a * b) // R + p + 1

    def ladder(v: int) -> int:
        acc = v
        for _ in range(8):
            acc = max(mul(acc, acc), mul(mul(acc, acc), v))
        return acc

    V = 2 * p  # entry contract
    for _ in range(cfg.rounds + 2):
        for _half in range(2):  # forward-alpha half, then inverse half
            V = ladder(V)
            V = len(groups) * ((g * V * p) // R + p + 1) + p  # MDS rows + rc
            if V >= R:
                mul(R, R)  # raise with the standard message
    mul(V, p)  # exit multiply by the Montgomery form of 1


def _rescue_kernel(
    rc_ref, runs_ref, state_ref, out_ref, *, cfg, lane_streams, relaxed,
    ladder_window=None,
):
    """Kernel body: (t, L, S, 128) VMEM tile through all 2N half-rounds.

    ``rc_ref``: (2N, t*L) SMEM Montgomery round constants.
    ``runs_ref``: the ladder schedule in SMEM (static content; SMEM so the
    digit loop stays a tiny ``fori_loop`` body instead of an unrolled
    ~255-step trace) — (n_runs,) squaring-run lengths for the default
    run-length ladder, or (n_steps, 2) [squarings, table index] rows when
    ``ladder_window`` selects the sliding-window ladder.
    """
    fs = cfg.field
    L, t, ns = fs.nlimbs, cfg.t, lane_streams
    C = t * ns  # interleaved chains per emission
    fc = mont.field_consts(fs)
    p_limbs = fc["p_tuple"]
    n0inv = int(fc["n0inv"])
    if relaxed:
        tail_norm = functools.partial(_relaxed_norm_multi, passes=2)
        small_norm = functools.partial(_relaxed_norm_multi, passes=1)
    else:
        tail_norm = None  # helpers default to the exact _norm1_multi
        small_norm = _norm1_multi
    groups = _mds_groups(L, t, quasi=relaxed)
    mds_ints = tuple(
        tuple(tuple(int(v) for v in fs.int_to_mont_limbs(c)) for c in row)
        for row in cfg.mds
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
        """(t, L, S, 128) tile -> C chains of L (h, 128) limbs, chain index
        c = s * t + e."""
        return [
            [st4[e, l, s * h : (s + 1) * h] for l in range(L)]
            for s in range(ns)
            for e in range(t)
        ]

    def pack(chains):
        return jnp.stack(
            [
                jnp.stack(
                    [
                        jnp.concatenate(
                            [chains[s * t + e][l] for s in range(ns)], axis=0
                        )
                        for l in range(L)
                    ]
                )
                for e in range(t)
            ]
        )

    def ladder_all(chains):
        """x^inv_alpha on all C chains (shared helpers, schedule in SMEM)."""
        if ladder_window is None:
            return _ladder_runs_multi(
                L, chains, chains, runs_ref, n_runs, trailing, p_limbs,
                n0inv, tail_norm,
            )
        return _ladder_window_multi(
            L, chains, chains, runs_ref, n_steps, lead_digit,
            p_limbs, n0inv, tail_norm, ladder_window, one_ints=one_ints,
        )

    def mds_rc(chains, rr):
        """All t rows x ns streams of the dense MDS in one interleaved REDC
        per lazy-accumulation group, then + rc[rr] and one small norm."""
        parts = [[] for _ in range(C)]
        for js in groups:
            red = _redc_multi(
                L,
                [
                    _mds_row_cols(
                        L, t, chains[s * t : (s + 1) * t], mds_ints[i], js
                    )
                    for s in range(ns)
                    for i in range(t)
                ],
                p_limbs,
                n0inv,
                tail_norm,
            )
            for c in range(C):
                parts[c].append(red[c])
        summed = [
            [
                v + rc_ref[rr, (c % t) * L + l]
                for l, v in enumerate(_sum_limbs(parts[c]))
            ]
            for c in range(C)
        ]
        return small_norm(summed)

    def round_body(r, chains):
        # Loop carry is the chains pytree — packing the C*L (h, 128) tiles
        # into one tensor per round would copy more than the round computes
        # for nothing (same reasoning as _ladder_runs_multi).
        chains = _pow_alpha_multi(
            L, chains, cfg.alpha, p_limbs, n0inv, tail_norm
        )
        chains = mds_rc(chains, 2 * r)
        chains = ladder_all(chains)
        chains = mds_rc(chains, 2 * r + 1)
        return chains

    chains = jax.lax.fori_loop(0, cfg.rounds, round_body, unpack(st4))

    # Exit: exact interleaved norm (values < R by the build-time bound check,
    # so the dropped top carry is provably zero), then one Montgomery multiply
    # by 1 (= REDC by R mod p) restoring canonical limbs and values < 2p.
    out_ref[:] = pack(_exit_canonicalize(L, chains, fs, p_limbs, n0inv))


@functools.lru_cache(maxsize=None)
def rescue_permute_fn(
    cfg: RescueConfig,
    interpret: bool = False,
    sublanes: int = 8,
    lane_streams: int | None = None,
    relaxed: bool = True,
    ladder_window: int | None | str = "auto",
):
    """Jitted fused Rescue-Prime permutation: (t, L, B) -> (t, L, B),
    B % (sublanes*128) == 0.  Raises when the static value-bound check
    fails for this config (use the XLA tier then).

    ``relaxed=True`` default: the ladder is a long serial schedule of
    REDC tails — the same regime where the chain-free norm won on the
    Poseidon CIOS kernel (DESIGN.md §20).

    ``ladder_window`` / ``lane_streams`` resolve through the shared family
    policies (``_resolve_ladder_window`` / ``_resolve_streams``).  Default
    tile: 8 sublanes, 1 stream — measured +14% over 16:2 for this kernel
    (223,035 vs 195,355/195,580 perms/s, order-controlled,
    bench/rescue_probe.py tile sweep; the smaller VMEM live set beats the
    extra stream interleave, same direction as DESIGN.md §21's
    register-pressure findings)."""
    if cfg.field.limb_bits != 12:
        # This family's kernel bound analysis (fold counts, row-sum budgets,
        # quasi ranges) is derived for the 12-bit limb plan; the 13-bit plan
        # (DESIGN S25) is currently wired through the Poseidon CIOS kernel
        # only.  Fail loudly rather than mask with a wrong limb width.
        raise ValueError(
            f"{cfg.field.name}: limb_bits={cfg.field.limb_bits} is not "
            "supported by this family kernel (12-bit plan only)"
        )
    _check_kernel_value_bounds(cfg)
    ladder_window = _resolve_ladder_window(cfg, ladder_window)
    lane_streams = _resolve_streams(sublanes, lane_streams)
    fs = cfg.field
    L, t = fs.nlimbs, cfg.t
    tile_lanes = sublanes * 128
    rc_np = np.stack(
        [
            np.concatenate([fs.int_to_mont_limbs(c) for c in row])
            for row in cfg.rc
        ]
    ).astype(np.int32)
    if ladder_window is None:
        runs, _trailing = _exponent_runs(cfg.inv_alpha)
        runs_np = np.asarray(runs, dtype=np.int32)
    else:
        _lead, digits = _window_schedule(cfg.inv_alpha, ladder_window)
        runs_np = np.asarray(digits, dtype=np.int32)

    kernel = functools.partial(
        _rescue_kernel, cfg=cfg, lane_streams=lane_streams, relaxed=relaxed,
        ladder_window=ladder_window,
    )
    # ~2*log2(p) products per element-round, each ~2L^2 int32 mul-adds.
    nbits = cfg.inv_alpha.bit_length()
    n_muls = len(runs_np) + (0 if ladder_window is None else (1 << ladder_window))
    products_per_round = 2 * (nbits + n_muls) + 2 * t

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
