"""Poseidon2 kernel on-TPU parity + throughput probe.

Parity-checks the Mosaic-lowered pallas_p2 kernel lane-by-lane against the
scalar oracle on random full-range states, then times it — same protocol as
the Poseidon bench (bench.py).  Poseidon2's linear layers are REDC-free, so
the expected headroom over the Poseidon rate-2 number (~6.9M perms/s) comes
from fewer Montgomery reductions per round.

Run: python bench/p2_probe.py [rate]
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from _harness import time_perms


def main():
    rate = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from sponge_tpu.utils.jaxcache import configure_cache
    configure_cache("/tmp/sponge_tpu_jax_cache")

    import bench as root_bench
    from sponge_tpu import BLS12_381_FR as fs
    from sponge_tpu import OraclePoseidon2Sponge, get_default_poseidon2_parameters
    from sponge_tpu.ops.pallas_p2 import p2_permute_fn

    cfg = get_default_poseidon2_parameters(fs, rate)
    B = 1 << 20

    lanes = 512
    vals = root_bench._random_state_ints(cfg, lanes)
    state_np = np.zeros((cfg.t, fs.nlimbs, B), dtype=np.int32)
    state_np[:, :, :lanes] = np.stack(
        [fs.ints_to_mont_plane(row) for row in vals], axis=0
    )

    fn = p2_permute_fn(cfg)
    state = jnp.asarray(state_np)
    out = fn(state)
    out_np = np.asarray(out[:, :, :lanes])
    for b in range(0, lanes, 61):
        o = OraclePoseidon2Sponge(cfg)
        o.state = [vals[i][b] for i in range(cfg.t)]
        o.permute()
        got = [fs.mont_limbs_to_int(out_np[i][:, b]) for i in range(cfg.t)]
        if got != o.state:
            raise RuntimeError(f"PARITY FAILURE at lane {b}: {got} != {o.state}")
        # Output invariant on the RAW limb value (before mod-p decode —
        # mont_limbs_to_int already reduces, so it cannot see a violation).
        raw = [fs.limbs_to_int(out_np[i][:, b]) for i in range(cfg.t)]
        if any(v >= 2 * fs.modulus for v in raw):
            raise RuntimeError(f"output invariant (< 2p) violated at lane {b}")
    print(json.dumps({"parity": "ok", "rate": rate, "lanes_checked": lanes // 61 + 1}))

    # Timing: warm window + best-of-3 chained windows (bench/_harness.py).
    pps = time_perms(fn, out, B, iters=30)
    print(
        json.dumps(
            {
                "metric": f"poseidon2_rate{rate}_bls12_381_fr_perms_per_sec",
                "value": int(pps),
                "unit": "perms/s",
            }
        )
    )


if __name__ == "__main__":
    main()
