"""MXU-MDS A/B probe (docs/DESIGN.md §24).

Measures cios_permute_fn with the MDS limb-convolution on the MXU
(mds_mxu=True: 6-bit-plane bf16 matmul, exact in f32) against the
production VPU schedule and the dense-VPU control, all oracle
parity-gated.  §24's verdict — the MXU removes 34% of VPU ALU ops but
loses ~8% wall-clock because the per-round dot serializes on the round
critical path — reproduces from this probe plus the op census printed
alongside.

Run: python bench/mds_mxu_probe.py [rate]
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from _harness import parity_gate, random_state, time_perms


def main():
    from sponge_tpu.utils.jaxcache import configure_cache

    configure_cache("/tmp/sponge_tpu_jax_cache")

    from sponge_tpu import BLS12_381_FR as FR, get_default_poseidon_parameters
    from sponge_tpu.ops.pallas_cios import TILE_LANES, cios_permute_fn
    from sponge_tpu.utils.profiling import kernel_op_census

    rate = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cfg = get_default_poseidon_parameters(FR, rate, False)
    B = 1 << (20 if rate == 2 else 18)
    rng = np.random.default_rng(5)
    lanes = 64
    vals, state_np = random_state(cfg, lanes, B, rng)
    state = jnp.asarray(state_np)

    rows = {}
    cases = [
        ("production_vpu", {}),
        ("dense_vpu", {"optimized": False}),
        ("mds_mxu", {"mds_mxu": True}),
    ]
    for label, kw in cases:
        fn = cios_permute_fn(cfg, **kw)
        out = fn(state)
        parity_gate(cfg, out, vals, lanes, label)
        # time_perms already runs one untimed warm window + best-of-3.
        pps = time_perms(fn, out, B)
        census = kernel_op_census(
            cios_permute_fn(cfg, **kw),
            jax.ShapeDtypeStruct((cfg.t, cfg.field.nlimbs, TILE_LANES), jnp.int32),
        )
        alu = sum(census.values()) / TILE_LANES
        rows[label] = {
            "perms_per_sec": pps,
            "ns_per_perm": 1e9 / pps,
            "vpu_alu_ops_per_perm": alu,
            "sustained_Tops": pps * alu / 1e12,
        }
        print(
            f"{label}: parity OK, {pps:,.0f} perms/s "
            f"({1e9 / pps:.2f} ns/perm, {alu:,.0f} ALU ops/perm, "
            f"{pps * alu / 1e12:.2f} T sustained)",
            flush=True,
        )

    result = {"metric": f"mds_mxu_ab_rate{rate}", **rows}
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
