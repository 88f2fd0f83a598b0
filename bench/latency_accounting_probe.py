"""Measured decomposition of the CIOS kernel's per-permutation latency.

docs/DESIGN.md §6 left ~40% between the shipped 255-bit throughput and the
interleaved-chain microbench's implied ceiling, attributed loosely to
"norm/pack/grid overhead plus the spill-threshold ceiling".  This probe
replaces that hand-wave with an ablation measurement: four kernels sharing
the production tile/grid (sublanes=16, 2 lane streams, relaxed norms) whose
bodies are nested prefixes of the production round schedule:

  copy       state -> out, no rounds        -> grid + HBM tile traffic
  ark+norm   every round: ARK add + 1-pass relaxed norm of all t elements
  +pow       ... plus the S-box schedule (t chains/full round, 1/partial)
  full       production cios_permute_fn (sparse-opt partial MDS + exit canon)

Component costs are the successive differences (sub-additive: chain
interleaving lets components overlap, so the differences UNDER-estimate
standalone cost and the sum reproduces the full latency by construction of
the nesting; the interesting output is the RATIO).  The +pow and full rows
are parity-meaningless (ablations are not the permutation) but the full row
is the production kernel and is oracle-gated in bench.py / full_bench.py.

Run: python bench/latency_accounting_probe.py
"""

from __future__ import annotations

import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    from sponge_tpu.utils.jaxcache import configure_cache
    configure_cache("/tmp/sponge_tpu_jax_cache")

    from sponge_tpu import BLS12_381_FR as FR, get_default_poseidon_parameters
    from sponge_tpu.ops import montgomery as mont
    from sponge_tpu.ops.pallas_cios import (
        SUBLANES,
        _norm1_multi,
        _pow_alpha_multi,
        _relaxed_norm_multi,
        cios_permute_fn,
    )

    cfg = get_default_poseidon_parameters(FR, 2, False)
    fs = cfg.field
    L, t = fs.nlimbs, cfg.t
    ns = 2  # production lane streams
    fc = mont.field_consts(fs)
    p_limbs = fc["p_tuple"]
    n0inv = int(fc["n0inv"])
    tail_norm = functools.partial(_relaxed_norm_multi, passes=2)
    small_norm = functools.partial(_relaxed_norm_multi, passes=1)
    half = cfg.full_rounds // 2

    ark_np = np.stack(
        [np.concatenate([fs.int_to_mont_limbs(c) for c in row]) for row in cfg.ark]
    ).astype(np.int32)

    def ablation_kernel(ark_ref, state_ref, out_ref, *, mode):
        st4 = state_ref[:]
        S = st4.shape[2]
        h = S // ns

        def unpack(st4):
            return [
                [[st4[e, l, s * h:(s + 1) * h] for l in range(L)] for e in range(t)]
                for s in range(ns)
            ]

        def pack(sts):
            return jnp.stack([
                jnp.stack([
                    jnp.concatenate([sts[s][e][l] for s in range(ns)], axis=0)
                    for l in range(L)
                ])
                for e in range(t)
            ])

        def round_body(r, st4, n_sbox):
            sts = unpack(st4)
            for e in range(t):
                added = [
                    [sts[s][e][l] + ark_ref[r % cfg.rounds, e * L + l]
                     for l in range(L)]
                    for s in range(ns)
                ]
                normed = small_norm(added)
                for s in range(ns):
                    sts[s][e] = normed[s]
            if mode == "pow":
                for e in range(n_sbox):
                    outs = _pow_alpha_multi(
                        L, [sts[s][e] for s in range(ns)], cfg.alpha,
                        p_limbs, n0inv, tail_norm,
                    )
                    for s in range(ns):
                        sts[s][e] = outs[s]
            return pack(sts)

        if mode == "copy":
            out_ref[:] = st4
            return
        # Same round structure as production: R_F full + R_P partial.
        st4 = jax.lax.fori_loop(
            0, half, lambda r, s: round_body(r, s, t), st4)
        st4 = jax.lax.fori_loop(
            half, half + cfg.partial_rounds, lambda r, s: round_body(r, s, 1), st4)
        st4 = jax.lax.fori_loop(
            half + cfg.partial_rounds, cfg.rounds,
            lambda r, s: round_body(r, s, t), st4)
        # Exit canonicalization (mirrors the production kernel's relaxed exit).
        sts = unpack(st4)
        flat = _norm1_multi([sts[s][e] for s in range(ns) for e in range(t)])
        for s in range(ns):
            for e in range(t):
                sts[s][e] = flat[s * t + e]
        out_ref[:] = pack(sts)

    def build(mode):
        kernel = functools.partial(ablation_kernel, mode=mode)
        tile_lanes = SUBLANES * 128

        @jax.jit
        def run(state):
            B = state.shape[-1]
            st4 = state.reshape(t, L, B // 128, 128)
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(st4.shape, jnp.int32),
                grid=(B // tile_lanes,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((t, L, SUBLANES, 128), lambda i: (0, 0, i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (t, L, SUBLANES, 128), lambda i: (0, 0, i, 0),
                    memory_space=pltpu.VMEM),
            )(jnp.asarray(ark_np), st4)
            return out.reshape(t, L, B)

        return run

    B = 1 << 20
    state = jnp.zeros((t, L, B), dtype=jnp.int32)

    def time_fn(fn, iters=8):
        cur = fn(state)
        _ = np.asarray(cur[0, 0, :8])
        t0 = time.perf_counter()
        cur2 = cur
        for _ in range(iters):
            cur2 = fn(cur2)
        _ = np.asarray(cur2[0, 0, :8])
        return (time.perf_counter() - t0) / iters / B

    rows = {}
    for mode in ("copy", "norm", "pow"):
        spp = time_fn(build(mode))
        rows[mode] = spp
        print(json.dumps({"metric": f"cios_ablation_{mode}_ns_per_perm",
                          "value": round(spp * 1e9, 2), "unit": "ns/perm"}))

    full_fn = cios_permute_fn(cfg)  # production: streams=2, relaxed
    spp = time_fn(full_fn)
    rows["full"] = spp
    print(json.dumps({"metric": "cios_ablation_full_ns_per_perm",
                      "value": round(spp * 1e9, 2), "unit": "ns/perm"}))

    print(json.dumps({
        "metric": "cios_latency_breakdown_ns",
        "grid_hbm": round(rows["copy"] * 1e9, 2),
        "ark_norm": round((rows["norm"] - rows["copy"]) * 1e9, 2),
        "sbox_redc": round((rows["pow"] - rows["norm"]) * 1e9, 2),
        "mds_and_rest": round((rows["full"] - rows["pow"]) * 1e9, 2),
        "full": round(rows["full"] * 1e9, 2),
        "unit": "ns/perm",
    }))


if __name__ == "__main__":
    main()
