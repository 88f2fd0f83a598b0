"""GMiMC fused-kernel vs XLA-tier on-TPU probe (BLS12-381 rate-2).

Measures the question docs/DESIGN.md §19 previously answered by analogy:
does keeping the GMiMC state resident in VMEM across all 226 rounds (the
full-deferral fused kernel, ops/pallas_gmimc.py) beat the XLA tier, whose
(t, L, B) state streams through HBM once per round?

Both tiers are parity-gated against the scalar oracle on the same random
lanes before timing (the probe refuses to print a number on mismatch).

Run: python bench/gmimc_kernel_probe.py
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp


from _harness import oracle_states, parity_gate, random_state, time_perms


def main():
    from sponge_tpu.utils.jaxcache import configure_cache
    configure_cache("/tmp/sponge_tpu_jax_cache")

    from sponge_tpu import BLS12_381_FR as FR, get_default_gmimc_parameters
    from sponge_tpu.gmimc import OracleGmimcSponge
    from sponge_tpu.gmimc.permutation import gmimc_permute_jit
    from sponge_tpu.ops.pallas_gmimc import gmimc_permute_fn

    cfg = get_default_gmimc_parameters(FR, 2)
    B = 1 << 17  # families_probe.py's gmimc_bls381_rate2 batch
    lanes = 64
    rng = np.random.default_rng(20260819)
    vals, state_np = random_state(cfg, lanes, B, rng)
    state = jnp.asarray(state_np)
    oracle = oracle_states(cfg, vals, lanes)

    for label, fn in (
        ("gmimc_bls381_rate2_xla", gmimc_permute_jit(cfg)),
        ("gmimc_bls381_rate2_fused", gmimc_permute_fn(cfg)),
        ("gmimc_bls381_rate2_fused_1stream", gmimc_permute_fn(cfg, lane_streams=1)),
        ("gmimc_bls381_rate2_fused_relaxed", gmimc_permute_fn(cfg, relaxed=True)),
    ):
        out = fn(state)
        parity_gate(cfg, out, vals, lanes, label, oracle=oracle)
        pps = time_perms(fn, out, B, iters=5)
        print(json.dumps({
            "metric": f"{label}_perms_per_sec",
            "value": int(pps),
            "unit": "perms/s",
            "parity": "ok",
        }))


if __name__ == "__main__":
    main()
