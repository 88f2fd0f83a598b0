"""Fused GMiMC-erf Pallas kernel: state resident in VMEM across all rounds.

Round structure (gmimc/permutation.py, ePrint 2019/397 erf variant):

    F   = (x_0 + c_r)^alpha
    x_i = x_i + F                 for i = 1..t-1
    state -> (x_1, ..., x_{t-1}, x_0)

The XLA tier re-normalizes every plane every round (`mont.fold_norm`).  The
kernel instead exploits GMiMC's shape end-to-end with a **full-deferral
discipline**: only the FRONT element ever feeds a multiplier, so the t-1
rest-branch adds are left completely un-normalized — limbs and values
accumulate across the whole permutation and are carried exactly:

* limb bound: an element accumulates at most ``rounds`` F-adds (F canonical
  or quasi-canonical, <= 2^12 + eps) on top of its <= 2^13 entry bound, so
  limbs stay <= (rounds + 2) * 2^13 < 2^23 for every shipped round count —
  far inside int32, and only ever used in ADDs until the element rotates to
  the front, where the (exact or chain-free) norm restores canonical limbs
  before the power map's column builders see them.
* value bound: each F-add adds < 2.1p, so element values stay
  < (2*rounds + 6)*p.  The kernel REQUIRES (2*rounds + 6)*p < R (the
  Montgomery radix 2^(12L)) so no normalization ever drops a top carry —
  true for every ~255-bit config (R/p headroom ~2^9) and for Goldilocks
  (2^8 headroom at the 6-limb layout, 62 rounds), checked at build time;
  ``batched_gmimc_permute`` falls back to the XLA tier when it fails
  (31-bit fields: R/p = 32 at L = 3).

Per-round device work is therefore ONE single-element power-map chain
(2 REDCs for alpha=5) plus t-1 un-normalized plane adds — the smallest round
body of any kernel in the repo — and the round-count-heavy schedule runs with
the state pinned in VMEM instead of streaming (t, L, B) through HBM ~rounds
times as the XLA tier does.  ``lane_streams=2`` interleaves two independent
sub-tiles so the serial REDC carry chains of consecutive steps overlap
(same motivation as pallas_cios._permute_kernel_streams).

Exit: one exact sequential norm (values < R, so the top carry is zero) and
one Montgomery multiply by 1 (REDC by R mod p) restore the framework-wide
output contract — canonical limbs, values < 2p.

Verified against the scalar oracle: in-CI over a high-headroom tiny field
(tests/test_gmimc.py), and parity-gated on TPU by bench/gmimc_kernel_probe.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import LIMB_BITS
from ..gmimc.config import GmimcConfig
from ..ops import montgomery as mont
from .pallas_cios import (
    SUBLANES,
    _norm1_multi,
    _pow_alpha_multi,
    _relaxed_norm_multi,
)
from .pallas_rescue import _exit_canonicalize, _resolve_streams


def _value_gate(cfg: GmimcConfig) -> bool:
    """True when the full-deferral value bound holds: (2*rounds + 6) * p < R."""
    fs = cfg.field
    return (2 * cfg.rounds + 6) * fs.modulus < (1 << (LIMB_BITS * fs.nlimbs))


def _gmimc_kernel(rc_ref, state_ref, out_ref, *, cfg, lane_streams, relaxed):
    """Kernel body: (t, L, S, 128) VMEM tile through all rounds.

    ``rc_ref``: (rounds, L) SMEM Montgomery round constants.
    """
    fs = cfg.field
    L, t, ns = fs.nlimbs, cfg.t, lane_streams
    fc = mont.field_consts(fs)
    p_limbs = fc["p_tuple"]
    n0inv = int(fc["n0inv"])
    if relaxed:
        # Front-norm input limbs reach ~(rounds+2)*2^13 < 2^23: two chain-free
        # passes land <= 2^12 + 2 (first pass carries <= 2^11, second <= 1),
        # inside the quasi-canonical budget of the power map's column
        # builders (see pallas_cios._relaxed_norm_multi / QUASI_LIMB_MAX).
        front_norm = functools.partial(_relaxed_norm_multi, passes=2)
        tail_norm = functools.partial(_relaxed_norm_multi, passes=2)
    else:
        front_norm = _norm1_multi
        tail_norm = None  # helpers default to the exact _norm1_multi

    st4 = state_ref[:]
    S = st4.shape[2]
    h = S // ns

    def unpack(st4):
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

    def round_body(r, sts):
        # Loop carry is the per-stream chains pytree — packing the t*L
        # (h, 128) tiles into one tensor per round would copy ~20x more
        # elements than this round's one power map computes (the dominant
        # cost of the original packed-carry kernel; see pallas_rescue).
        fronts = front_norm(
            [[sts[s][0][l] + rc_ref[r, l] for l in range(L)] for s in range(ns)]
        )
        f = _pow_alpha_multi(L, fronts, cfg.alpha, p_limbs, n0inv, tail_norm)
        # rest += F fully deferred; the ORIGINAL front (no constant, no norm)
        # rotates to the back — bounds in the module docstring.
        return [
            [
                [a + b for a, b in zip(sts[s][i], f[s])] for i in range(1, t)
            ] + [sts[s][0]]
            for s in range(ns)
        ]

    sts = jax.lax.fori_loop(0, cfg.rounds, round_body, unpack(st4))

    # Shared exit (values < R by the build-time gate): exact norm +
    # Montgomery-by-1, restoring the < 2p output contract, chains interleaved.
    flat = _exit_canonicalize(
        L, [sts[s][e] for s in range(ns) for e in range(t)], fs, p_limbs,
        n0inv,
    )
    for s in range(ns):
        for e in range(t):
            sts[s][e] = flat[s * t + e]
    out_ref[:] = pack(sts)


@functools.lru_cache(maxsize=None)
def gmimc_permute_fn(
    cfg: GmimcConfig,
    interpret: bool = False,
    sublanes: int = SUBLANES,
    lane_streams: int | None = None,
    relaxed: bool = False,
):
    """Jitted fused GMiMC permutation: (t, L, B) -> (t, L, B),
    B % (sublanes*128) == 0.  Raises when the full-deferral value gate fails
    for this config (use the XLA tier then).

    ``relaxed=False`` default: unlike the Poseidon CIOS kernel (where the
    chain-free norm won +10% at exposed-chain shapes), GMiMC's measured
    ordering is exact 3.87M >= relaxed 3.82M perms/s (v5e, B=2^17,
    bench/gmimc_kernel_probe.py) — the single front-element norm per round
    is too small a fraction of the pow-chain schedule to pay for the
    relaxed form's extra passes."""
    if cfg.field.limb_bits != 12:
        # This family's kernel bound analysis (fold counts, row-sum budgets,
        # quasi ranges) is derived for the 12-bit limb plan; the 13-bit plan
        # (DESIGN S25) is currently wired through the Poseidon CIOS kernel
        # only.  Fail loudly rather than mask with a wrong limb width.
        raise ValueError(
            f"{cfg.field.name}: limb_bits={cfg.field.limb_bits} is not "
            "supported by this family kernel (12-bit plan only)"
        )
    if not _value_gate(cfg):
        raise ValueError(
            f"GMiMC fused kernel needs (2*rounds+6)*p < R; "
            f"{cfg.field.name} with {cfg.rounds} rounds fails the bound"
        )
    lane_streams = _resolve_streams(sublanes, lane_streams)
    fs = cfg.field
    L, t = fs.nlimbs, cfg.t
    tile_lanes = sublanes * 128
    rc_np = np.stack([fs.int_to_mont_limbs(c) for c in cfg.rc]).astype(np.int32)

    kernel = functools.partial(
        _gmimc_kernel, cfg=cfg, lane_streams=lane_streams, relaxed=relaxed
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
                flops=cfg.rounds * 3 * 2 * L * L * tile_lanes,
                bytes_accessed=2 * t * L * tile_lanes * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(jnp.asarray(rc_np), st4)
        return out.reshape(t, L, B)

    return run
