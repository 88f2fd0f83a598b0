"""Microbenchmark: is the Montgomery multiply latency-bound or throughput-bound?

Two Pallas kernels with IDENTICAL total work (64 CIOS Montgomery multiplies per
lane over the BLS12-381 Fr limb plan):

  * "dependent"   — one serial chain x -> x*c -> ... (64 deep);
  * "independent" — two interleaved chains of 32 (x and y advance in lockstep,
    emission interleaved per multiply).

If the VPU were stalling on the 22-step REDC carry chain, the independent
variant would run up to ~2x faster (latency hidden by the sibling chain).
Equal times mean the kernel is throughput-bound and latency tricks cannot help.
Companion evidence to bench/pipeline_probe.py for the ROADMAP hypothesis.

Run: python bench/latency_probe.py
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
from jax.experimental.pallas import tpu as pltpu

CHAIN = 64
SUBLANES = 16
TILE = SUBLANES * 128


def main():
    from sponge_tpu.utils.jaxcache import configure_cache
    configure_cache("/tmp/sponge_tpu_jax_cache")

    from sponge_tpu import BLS12_381_FR as fs
    from sponge_tpu.ops import montgomery as mont
    from sponge_tpu.ops.pallas_cios import _cios_mul, _redc_multi, _mul_cols

    L = fs.nlimbs
    fc = mont.field_consts(fs)
    p_t, n0 = fc["p_tuple"], int(fc["n0inv"])
    c_limbs = tuple(int(v) for v in fs.int_to_mont_limbs(1234567891011))

    def dep_kernel(x_ref, o_ref):
        limbs = [x_ref[l] for l in range(L)]
        cl = [jnp.full_like(limbs[0], c) for c in c_limbs]
        for _ in range(CHAIN):
            limbs = _cios_mul(L, limbs, cl, p_t, n0)
        for l in range(L):
            o_ref[l] = limbs[l]

    def indep_kernel(x_ref, o_ref):
        xs = [x_ref[l] for l in range(L)]
        cl = [jnp.full_like(xs[0], c) for c in c_limbs]
        ys = [v + 0 for v in xs]
        for _ in range(CHAIN // 2):
            xs, ys = _redc_multi(
                L, [_mul_cols(L, xs, cl), _mul_cols(L, ys, cl)], p_t, n0
            )
        for l in range(L):
            o_ref[l] = xs[l] + ys[l]

    B = 1 << 20
    x = np.zeros((L, B // 128, 128), dtype=np.int32)
    x[0] = 1

    results = {}
    for name, kernel in (("dependent", dep_kernel), ("independent", indep_kernel)):
        fn = jax.jit(
            lambda st, k=kernel: pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct(st.shape, jnp.int32),
                grid=(B // TILE,),
                in_specs=[
                    pl.BlockSpec(
                        (L, SUBLANES, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM,
                    )
                ],
                out_specs=pl.BlockSpec(
                    (L, SUBLANES, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
                ),
            )(st)
        )
        out = fn(jnp.asarray(x))
        _ = np.asarray(out[0, 0, :4])
        t0 = time.time()
        reps = 8
        for _ in range(reps):
            out = fn(out)
        _ = np.asarray(out[0, 0, :4])
        dt = (time.time() - t0) / reps
        ns_per_mul = dt / (B * CHAIN) * 1e9
        results[name] = ns_per_mul
        print(json.dumps({"variant": name, "ns_per_modmul_per_lane": round(ns_per_mul, 3)}))

    print(json.dumps({
        "independent_vs_dependent": round(results["independent"] / results["dependent"], 4),
        "interpretation": "ratio ~1.0 => throughput-bound; ~0.5 => latency-bound",
    }))


if __name__ == "__main__":
    main()
