"""Empirical VPU int32 roofline for the CIOS limb plan (DESIGN.md §23).

DESIGN §21 accounted the 145 ns/permutation line-by-line (92% REDC chains)
but never stated what fraction of the chip's integer throughput that is —
"this limb plan's established boundary" was measured only against itself.
This probe closes that gap empirically, with no reliance on unpublished
microarchitecture numbers:

  1. measure the device's peak sustained int32 elementwise issue rate with a
     synthetic Pallas kernel: CHAINS independent register-resident (8, 128)
     accumulator chains, each advanced UNROLL steps per loop iteration
     (straight-line mul/add streams — the same shape as the CIOS kernel's
     interleaved REDC chains);
  2. count the production kernel's EXACT emitted int32 ALU ops per
     permutation-lane from its own jaxpr (utils.profiling.kernel_op_census —
     the static op_counts estimate overcounts muls ~21% by assuming dense
     MDS in partial rounds);
  3. report utilization = measured kernel ops/s vs the synthetic peak.

Design notes from the measurement campaign (kept so the numbers are
reproducible and the negatives aren't re-run):
  * (256, 1024) chain tiles: 0.40 Tops/s — 1024 live vregs per chain force
    every step through VMEM.  Chains must be single vregs.
  * single-vreg chains without unrolling: 1.3 Tops/s — loop-carried vregs
    round-trip through memory each iteration; deep in-body unrolling
    amortizes that to noise.
  * mul-only streams cap ~4.9 Tops/s; 1:1 mul/add mixes reach ~5.4 Tops/s —
    the VPU issues the mixed stream wider, and the CIOS kernel's op mix is
    ~1:1 mul:add, so the mixed peak is the relevant roofline.

Run: python bench/vpu_roofline_probe.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from _harness import parity_gate, random_state, time_perms

SUB, LANES, ITERS = 8, 128, 1 << 11
# (chains, unroll) sweep points; the campaign's convergence plateau.
SWEEP = ((24, 128), (16, 128), (12, 256))


def _chain_kernel(op, chains, unroll):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        accs = [x + jnp.int32(k) for k in range(chains)]

        def body(i, accs):
            for _ in range(unroll):
                if op == "mul":
                    accs = [a * x for a in accs]
                elif op == "add":
                    accs = [a + x for a in accs]
                else:  # mix: one mul step then one add step per chain
                    accs = [a * x for a in accs]
                    accs = [a + x for a in accs]
            return accs

        accs = jax.lax.fori_loop(0, ITERS, body, accs)
        acc = accs[0]
        for a in accs[1:]:
            acc = acc ^ a
        o_ref[...] = acc

    return kernel


def measure_peak(op: str, reps: int = 100) -> float:
    """Best sustained int32 ``op`` rate (scalar ops/s) over the sweep."""
    x = jnp.arange(SUB * LANES, dtype=jnp.int32).reshape(SUB, LANES) | 1

    best = 0.0
    for chains, unroll in SWEEP:
        fn = jax.jit(
            pl.pallas_call(
                _chain_kernel(op, chains, unroll),
                out_shape=jax.ShapeDtypeStruct((SUB, LANES), jnp.int32),
            )
        )
        out = fn(x)
        _ = np.asarray(out[:2, :2])  # force compile + first run
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(x)
        _ = np.asarray(out[:2, :2])
        dt = time.perf_counter() - t0
        per_step = 2 if op == "mix" else 1
        rate = reps * SUB * LANES * chains * ITERS * unroll * per_step / dt
        print(
            f"  {op} chains={chains} unroll={unroll}: {rate / 1e12:.3f} Tops/s",
            flush=True,
        )
        best = max(best, rate)
    return best


def main():
    from sponge_tpu.utils.jaxcache import configure_cache

    configure_cache("/tmp/sponge_tpu_jax_cache")

    from sponge_tpu import BLS12_381_FR as FR, get_default_poseidon_parameters
    from sponge_tpu.ops.pallas_cios import TILE_LANES, cios_permute_fn
    from sponge_tpu.utils.profiling import kernel_op_census, op_counts

    cfg = get_default_poseidon_parameters(FR, 2, False)

    peak = {op: measure_peak(op) for op in ("mix", "mul", "add")}
    for op, rate in peak.items():
        print(f"peak int32 {op}: {rate / 1e12:.3f} Tops/s", flush=True)

    # Exact emitted op counts per permutation-lane, from the kernel jaxpr.
    census = kernel_op_census(
        cios_permute_fn(cfg),
        jax.ShapeDtypeStruct((cfg.t, cfg.field.nlimbs, TILE_LANES), jnp.int32),
    )
    per_lane = {k: v / TILE_LANES for k, v in census.items()}
    alu_per_perm = sum(per_lane.values())
    muls_per_perm = per_lane.get("mul", 0.0)
    print(f"kernel census per lane: {per_lane}", flush=True)

    # Production kernel rate, oracle parity-gated exactly like bench.py.
    B = 1 << 20
    rng = np.random.default_rng(5)
    lanes = 64
    vals, state_np = random_state(cfg, lanes, B, rng)
    fn = cios_permute_fn(cfg)
    state = jnp.asarray(state_np)
    out = fn(state)
    parity_gate(cfg, out, vals, lanes, "cios")
    print("parity gate: cios matches oracle", flush=True)
    # time_perms already runs one untimed warm window + best-of-3.
    pps = time_perms(fn, out, B)

    result = {
        "metric": "vpu_int32_utilization",
        "perms_per_sec": pps,
        "census_int32_muls_per_perm": muls_per_perm,
        "census_int32_alu_ops_per_perm": alu_per_perm,
        "static_estimate_muls_per_perm": op_counts(cfg)["int32_muls_cios_per_lane"],
        "kernel_sustained_Tops": pps * alu_per_perm / 1e12,
        "peak_mix_Tops": peak["mix"] / 1e12,
        "peak_mul_Tops": peak["mul"] / 1e12,
        "peak_add_Tops": peak["add"] / 1e12,
        "utilization_vs_mix_peak": pps * alu_per_perm / peak["mix"],
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
