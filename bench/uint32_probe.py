"""uint32 vs int32 VPU issue rate + semantics: the gate for the 13-bit plan.

The 13-bit limb plan (DESIGN §25) cuts L from 22 to 20 for the 255-bit
fields, but its worst REDC column sums 39 partial products of < 2^26 —
~2.6e9, over the int32 bound the 12-bit plan is built on (fields.py
__post_init__) yet under 2^32.  Computing the kernel in *uint32* keeps the
exact same op structure (mask / logical-shift / mul-low-32 / add) with the
budget doubled — IF the VPU issues uint32 streams at the int32 rate and the
semantics hold (wraparound mul low bits, logical right shift).

This probe answers both questions empirically:

  1. semantics: a uint32 mul whose product lands in [2^31, 2^32) must
     round-trip exactly through mask/shift inside a Pallas kernel;
  2. throughput: the §23 synthetic-chain kernel (CHAINS independent
     register-resident (8, 128) accumulator chains, UNROLL straight-line
     mul+add steps) timed in int32 vs uint32 under the hardened
     warm+best-of-3 protocol.

Verdict feeds docs/DESIGN.md §25.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _semantics_kernel(x_ref, y_ref, out_ref):
    # Products straddling 2^31: mask + logical shift must reassemble exactly.
    x = x_ref[:]
    y = y_ref[:]
    prod = x * y  # true value < 2^32: low-32 mul IS the value in uint32
    lo = prod & 0x1FFF  # 13-bit limb mask
    hi = prod >> 13  # logical shift (uint32) — must not sign-extend
    out_ref[:] = lo + (hi << 13)


def check_semantics():
    rng = np.random.default_rng(7)
    # Draw so x*y in [2^31, 2^32): x in [2^13, 2^16), y chosen to straddle.
    x = rng.integers(1 << 13, 1 << 16, size=(8, 128), dtype=np.uint32)
    y = ((1 << 31) + rng.integers(0, 1 << 30, size=(8, 128), dtype=np.uint64)) // x
    y = y.astype(np.uint32)
    out = pl.pallas_call(
        _semantics_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x), jnp.asarray(y))
    want = (x.astype(np.uint64) * y) & 0xFFFFFFFF
    got = np.asarray(out).astype(np.uint64)
    assert (want >= 1 << 31).any(), "draw failed to straddle 2^31"
    if not np.array_equal(got, want):
        raise RuntimeError("uint32 mask/shift semantics MISMATCH in Pallas")
    return True


SUB, LANES, ITERS = 8, 128, 1 << 11
SWEEP = ((24, 128), (16, 128))  # (chains, unroll): the §23 convergence plateau


def _chain_kernel(dtype, chains, unroll):
    """The §23 synthetic-peak kernel (bench/vpu_roofline_probe.py), 1:1
    mul/add mix, with the accumulator dtype parameterized."""

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        accs = [x + jnp.asarray(k, dtype) for k in range(chains)]

        def body(i, accs):
            for _ in range(unroll):
                accs = [a * x for a in accs]
                accs = [a + x for a in accs]
            return accs

        accs = jax.lax.fori_loop(0, ITERS, body, accs)
        acc = accs[0]
        for a in accs[1:]:
            acc = acc ^ a
        o_ref[...] = acc

    return kernel


def time_chains(dtype, reps=100):
    x = jnp.asarray(
        (np.arange(SUB * LANES).reshape(SUB, LANES) | 1), dtype=dtype
    )
    best = 0.0
    for chains, unroll in SWEEP:
        fn = jax.jit(
            pl.pallas_call(
                _chain_kernel(dtype, chains, unroll),
                out_shape=jax.ShapeDtypeStruct((SUB, LANES), dtype),
            )
        )
        out = fn(x)
        _ = np.asarray(out[:2, :2])
        # Warm window then best-of-3 (the _harness.time_perms protocol).
        for _ in range(reps):
            out = fn(x)
        _ = np.asarray(out[:2, :2])
        for _w in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(x)
            _ = np.asarray(out[:2, :2])
            dt = time.perf_counter() - t0
            rate = reps * SUB * LANES * chains * ITERS * unroll * 2 / dt
            best = max(best, rate)
    return best / 1e12


def main():
    sem = check_semantics()
    rows = {"semantics_ok": bool(sem)}
    for name, dt in (("int32", jnp.int32), ("uint32", jnp.uint32)):
        tops = time_chains(dt)
        rows[f"{name}_tops"] = round(tops, 3)
    rows["uint32_vs_int32"] = round(rows["uint32_tops"] / rows["int32_tops"], 4)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
