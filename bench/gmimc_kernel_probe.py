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
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp


def _time_perms(fn, first_out, B, iters):
    cur = first_out
    t0 = time.perf_counter()
    for _ in range(iters):
        cur = fn(cur)
    _ = np.asarray(cur[0, 0, :8])
    dt = time.perf_counter() - t0
    return iters * B / dt


def main():
    from sponge_tpu.utils.jaxcache import configure_cache
    configure_cache("/tmp/sponge_tpu_jax_cache")

    from sponge_tpu import BLS12_381_FR as FR, get_default_gmimc_parameters
    from sponge_tpu.gmimc import OracleGmimcSponge
    from sponge_tpu.gmimc.permutation import gmimc_permute_jit
    from sponge_tpu.ops.pallas_gmimc import gmimc_permute_fn

    cfg = get_default_gmimc_parameters(FR, 2)
    fs = cfg.field
    t = cfg.t
    B = 1 << 17  # families_probe.py's gmimc_bls381_rate2 batch
    lanes = 64
    rng = np.random.default_rng(20260819)
    vals = [
        [int(v) % fs.modulus for v in rng.integers(0, 1 << 62, size=lanes)]
        for _ in range(t)
    ]
    state_np = np.zeros((t, fs.nlimbs, B), dtype=np.int32)
    state_np[:, :, :lanes] = np.stack(
        [fs.ints_to_mont_plane(row) for row in vals], axis=0
    )
    state = jnp.asarray(state_np)

    oracle_states = []
    for b in range(0, lanes, 13):
        o = OracleGmimcSponge(cfg)
        o.state = [vals[i][b] for i in range(t)]
        o.permute()
        oracle_states.append((b, [v % fs.modulus for v in o.state]))

    for label, fn in (
        ("gmimc_bls381_rate2_xla", gmimc_permute_jit(cfg)),
        ("gmimc_bls381_rate2_fused", gmimc_permute_fn(cfg)),
        ("gmimc_bls381_rate2_fused_1stream", gmimc_permute_fn(cfg, lane_streams=1)),
        ("gmimc_bls381_rate2_fused_exact", gmimc_permute_fn(cfg, relaxed=False)),
    ):
        out = fn(state)
        out_np = np.asarray(out[:, :, :lanes])
        for b, want in oracle_states:
            got = [
                fs.mont_limbs_to_int(out_np[i][:, b]) % fs.modulus
                for i in range(t)
            ]
            if got != want:
                raise RuntimeError(f"{label} PARITY FAILURE at lane {b}")
        pps = _time_perms(fn, out, B, iters=5)
        print(json.dumps({
            "metric": f"{label}_perms_per_sec",
            "value": int(pps),
            "unit": "perms/s",
            "parity": "ok",
        }))


if __name__ == "__main__":
    main()
