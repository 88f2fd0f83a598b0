"""Cross-family sustained-issue-rate report (the §23 methodology, widened).

For each shipped fused kernel, this probe measures warm best-of-3
throughput (bench/_harness.py protocol), counts the kernel's EXACT emitted
VPU ALU ops per permutation-lane from its own jaxpr
(utils.profiling.kernel_op_census), and reports the product — sustained
int32 ops/s — as a fraction of the CIOS kernel's measured 5.67 T ops/s
(itself 105% of the best synthetic VPU peak, DESIGN.md §23).

A family sustaining well below that fraction is NOT issue-bound: its
gap is latency (dependency chains), layout overhead, or dispatch — i.e.
real optimization headroom.  This is the measurement that (round 4)
exposed the Monolith probes' timing-methodology artifact and ranks where
kernel effort should go next.

Run on a QUIET box: python bench/family_census_probe.py
(host CPU load starves the chained-dispatch path and corrupts every
number — the warm best-of-3 protocol guards against clock ramp, not
against a saturated host.)
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

REF_TOPS = 5.67e12  # CIOS sustained rate = the empirical issue roofline (§23)


def main():
    from sponge_tpu.utils.jaxcache import configure_cache

    configure_cache("/tmp/sponge_tpu_jax_cache")

    from sponge_tpu import (
        BABYBEAR_FR,
        BLS12_381_FR,
        GOLDILOCKS_FR,
        KOALABEAR_FR,
        MERSENNE31_FR,
        get_default_poseidon2_parameters,
        get_default_poseidon_parameters,
    )
    from sponge_tpu.monolith import get_default_monolith_parameters
    from sponge_tpu.ops.pallas_cios import TILE_LANES as tile
    from sponge_tpu.ops.pallas_cios import cios_permute_fn
    from sponge_tpu.ops.pallas_monolith import monolith_kernel_fn
    from sponge_tpu.ops.pallas_p2 import p2_permute_fn
    from sponge_tpu.utils.profiling import kernel_op_census

    B = 1 << 20
    rng = np.random.default_rng(11)
    cases = [
        ("poseidon_bls_r2", get_default_poseidon_parameters(BLS12_381_FR, 2, False),
         cios_permute_fn),
        ("poseidon2_bls_r2", get_default_poseidon2_parameters(BLS12_381_FR, 2),
         p2_permute_fn),
        ("poseidon2_goldilocks_r8", get_default_poseidon2_parameters(GOLDILOCKS_FR, 8),
         p2_permute_fn),
        ("poseidon2_babybear_r8", get_default_poseidon2_parameters(BABYBEAR_FR, 8),
         p2_permute_fn),
        ("monolith_goldilocks", get_default_monolith_parameters(GOLDILOCKS_FR),
         monolith_kernel_fn),
        ("monolith_mersenne31", get_default_monolith_parameters(MERSENNE31_FR),
         monolith_kernel_fn),
        ("monolith_koalabear", get_default_monolith_parameters(KOALABEAR_FR),
         monolith_kernel_fn),
    ]
    rows = {}
    for label, cfg, make in cases:
        fs = cfg.field
        lanes = 64
        vals, state_np = random_state(cfg, lanes, B, rng)
        fn = make(cfg)
        out = fn(jnp.asarray(state_np))
        parity_gate(cfg, out, vals, lanes, label)
        pps = time_perms(fn, out, B, iters=10)
        # Census at one tile: every kernel here is grid-uniform over lanes.
        census = kernel_op_census(
            make(cfg), jax.ShapeDtypeStruct((cfg.t, fs.nlimbs, tile), jnp.int32)
        )
        alu = sum(census.values()) / tile
        tops = pps * alu
        rows[label] = {
            "perms_per_sec": int(pps),
            "alu_ops_per_perm": round(alu),
            "sustained_Tops": round(tops / 1e12, 2),
            "frac_of_issue_roofline": round(tops / REF_TOPS, 2),
        }
        print(
            f"{label}: {pps / 1e6:8.2f}M perms/s  {alu:9,.0f} ops/perm  "
            f"{tops / 1e12:5.2f}T  ({tops / REF_TOPS:4.0%} of roofline)",
            flush=True,
        )
    print(json.dumps({"metric": "family_census", **rows}), flush=True)


if __name__ == "__main__":
    main()
