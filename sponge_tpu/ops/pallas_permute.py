"""Fused Pallas TPU kernel for the full Poseidon permutation.

The performance centerpiece of the framework.  The pure-XLA tier
(``sponge_tpu.poseidon.permutation``) materializes round intermediates in HBM —
at B = 2^20 that is gigabytes of temporaries (observed OOM) and every round pays
HBM bandwidth.  This kernel runs *all* R_F + R_P rounds over a batch tile that
stays resident in VMEM: state is read from HBM once and written once per
permutation, making the kernel compute-bound on the int32 VPU.

Layout: state (t, L, B) is tiled over the batch (lane) axis into (t, L, TB)
blocks; the limb axis L sits on sublanes.  Round constants (ark) are gathered per
round from a VMEM-resident (R, t, L, 1) input; the field constants p / N' and the
MDS matrix arrive as small VMEM inputs (Pallas forbids captured array constants).
The arithmetic is the exact same non-interleaved Montgomery REDC as the jnp tier
(``ops.montgomery``), so the two tiers are semantically identical by construction
and are cross-checked in tests.

Round structure mirrors /root/reference/src/poseidon/mod.rs:95-118.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..poseidon.config import PoseidonConfig, device_constants
from . import montgomery as mont

# Default batch-tile width (lanes) per kernel program.  VMEM working set per
# tile is dominated by the one-shot MDS schoolbook temporaries,
# ~4 * t^2 * 2L * TB * 4B live at once — 512 lanes fits 16 MB VMEM for t <= 5
# but OOMs at t = 9 (observed: 33.6 MB > the 16 MB scoped-vmem limit), so the
# tile shrinks with the state width via ``tile_for``.
DEFAULT_TILE = 512


def tile_for(cfg: PoseidonConfig) -> int:
    """Largest power-of-two batch tile (<= DEFAULT_TILE, >= 128) whose MDS
    temporaries fit the 16 MB scoped-VMEM budget."""
    L = cfg.field.nlimbs
    tile = DEFAULT_TILE
    # Budget 8 MB against the 16 MB scoped-VMEM limit: Mosaic's measured
    # stack allocation runs ~1.5x this t^2 product-term estimate (observed
    # 18.47M actual vs 12.58M estimated at t=16, L=3 — a hard OOM when the
    # budget was 12 MB), so keep ~2x headroom.
    while tile > 128 and 4 * cfg.t * cfg.t * 2 * L * tile * 4 > 8 * (1 << 20):
        tile //= 2
    return tile


def _round_in_kernel(cfg, ark_r, mds, p, nprime, state, full: bool):
    """One Poseidon round on a (t, L, TB) VMEM-resident state tile."""
    fs = cfg.field
    state = mont.mont_add(fs, state, ark_r)
    if full:
        state = mont.mont_pow(fs, state, cfg.alpha, p, nprime)
    else:
        s0 = mont.mont_pow(fs, state[0], cfg.alpha, p, nprime)
        state = jnp.concatenate([s0[None], state[1:]], axis=0)
    prod = mont.mont_mul(fs, mds, state[None], p, nprime)  # (t, t, L, TB)
    return mont.normalize(jnp.sum(prod, axis=1), passes=2, lb=fs.limb_bits)


def _permute_kernel(ark_ref, mds_ref, state_ref, out_ref, *, cfg):
    mds = mds_ref[:]          # (t, t, L, 1)
    state = state_ref[:]      # (t, L, TB)
    # Field constants enter as static python-int limb tuples -> scalar immediates.
    fc = mont.field_consts(cfg.field)
    p, nprime = fc["p_tuple"], fc["nprime_tuple"]

    half_full = cfg.full_rounds // 2

    # Round constants are gathered from the VMEM ref per round (dynamic ref
    # indexing lowers to a VMEM load; dynamic_slice on a *value* does not).
    def full_body(r, st):
        return _round_in_kernel(cfg, ark_ref[r], mds, p, nprime, st, full=True)

    def partial_body(r, st):
        return _round_in_kernel(cfg, ark_ref[r], mds, p, nprime, st, full=False)

    state = jax.lax.fori_loop(0, half_full, full_body, state)
    state = jax.lax.fori_loop(
        half_full, half_full + cfg.partial_rounds, partial_body, state
    )
    state = jax.lax.fori_loop(
        half_full + cfg.partial_rounds, cfg.rounds, full_body, state
    )
    out_ref[:] = state


@functools.lru_cache(maxsize=None)
def pallas_permute_fn(
    cfg: PoseidonConfig, tile: int | None = None, interpret: bool = False
):
    """Jitted fused permutation: (t, L, B) -> (t, L, B), B a multiple of ``tile``
    (default: ``tile_for(cfg)`` — VMEM-safe for any state width).

    ``interpret=True`` runs the Pallas interpreter (CPU testing).
    """
    if tile is None:
        tile = tile_for(cfg)
    fs = cfg.field
    L = fs.nlimbs
    t = cfg.t
    R = cfg.rounds
    consts = device_constants(cfg)
    ark_np = consts["ark"]
    mds_np = consts["mds"]

    kernel = functools.partial(_permute_kernel, cfg=cfg)

    @jax.jit
    def run(state):
        B = state.shape[-1]
        if B % tile != 0:
            raise ValueError(f"batch {B} must be a multiple of tile {tile}")
        grid = (B // tile,)
        flops_per_lane = cfg.rounds * 40 * (3 * L * L)  # rough: muls dominate
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(state.shape, jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((R, t, L, 1), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((t, t, L, 1), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((t, L, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (t, L, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops_per_lane * tile,
                bytes_accessed=2 * t * L * tile * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(jnp.asarray(ark_np), jnp.asarray(mds_np), state)

    return run
