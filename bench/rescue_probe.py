"""Rescue-Prime on-TPU parity + throughput probe: XLA tier vs fused kernel.

Rescue's inverse S-box is a ~log2(p)-bit exponent ladder per element-round,
so its forward throughput is designed-in orders of magnitude below Poseidon
(the family trades prover-side work for in-circuit cheapness — see
rescue/permutation.py).  This probe records the measured cost of that trade
on TPU for the two ends of the field-size spectrum: BLS12-381 Fr rate-2
(255-bit ladder) and Mersenne31 rate-8 (31-bit ladder) — for BOTH tiers:
the portable XLA ladder and the fused VMEM-resident run-length-ladder
kernel (ops/pallas_rescue.py).  Each row is parity-gated against the
scalar oracle before timing, like bench/goldilocks_probe.py.

Run: python bench/rescue_probe.py
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

    from sponge_tpu import (
        BLS12_381_FR as FR,
        MERSENNE31_FR as M31,
        OracleRescueSponge,
        get_default_rescue_parameters,
    )
    from sponge_tpu.ops.pallas_rescue import rescue_permute_fn
    from sponge_tpu.rescue.permutation import rescue_permute_jit

    rng = np.random.default_rng(20260817)
    lanes = 64
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    only = pos[0] if pos else None

    for label, fs, rate, B in (
        ("bls381_rate2", FR, 2, 1 << 17),
        ("mersenne31_rate8", M31, 8, 1 << 18),
    ):
        if only and only not in label:
            continue
        cfg = get_default_rescue_parameters(fs, rate)
        vals, state_np = random_state(cfg, lanes, B, rng)
        oracle = oracle_states(cfg, vals, lanes)
        tiers = [
            ("xla", rescue_permute_jit(cfg)),
            ("kernel", rescue_permute_fn(cfg)),
            ("kernel_w3", rescue_permute_fn(cfg, ladder_window=3)),
            ("kernel_w4", rescue_permute_fn(cfg, ladder_window=4)),
        ]
        if "--xla" not in sys.argv:
            tiers = tiers[1:]
        for tier, fn in tiers:
            out = fn(jnp.asarray(state_np))
            parity_gate(cfg, out, vals, lanes, f"rescue {label} {tier}",
                        oracle=oracle)
            pps = time_perms(fn, out, B, iters=5)
            print(
                json.dumps(
                    {
                        "metric": f"rescue_{label}_{tier}_perms_per_sec",
                        "value": int(pps),
                        "unit": "perms/s",
                        "rounds": cfg.rounds,
                        "parity": "ok",
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
