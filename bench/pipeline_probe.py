"""A/B probe: serial vs chain-interleaved (software-pipelined) CIOS kernel.

Measures the rate-2 BLS12-381 permutation at B=2^20 on the local accelerator
for both emission orders of the independent REDC chains (see
ops/pallas_cios.py "Software-pipelined variants"), each parity-checked against
the scalar oracle on random states before timing.  Evidence artifact for the
REDC-latency-bottleneck hypothesis (ROADMAP "Performance").

Run: python bench/pipeline_probe.py [--log-batch 20] [--reps 8]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-batch", type=int, default=20)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    from sponge_tpu.utils.jaxcache import configure_cache

    configure_cache("/tmp/sponge_tpu_jax_cache")

    import bench as root_bench
    from sponge_tpu import BLS12_381_FR, get_default_poseidon_parameters
    from sponge_tpu.ops.pallas_cios import cios_permute_fn
    from sponge_tpu.poseidon.oracle import OraclePoseidonSponge

    cfg = get_default_poseidon_parameters(BLS12_381_FR, 2, False)
    fs = cfg.field
    B = 1 << args.log_batch

    lanes = 512
    vals = root_bench._random_state_ints(cfg, lanes)
    state_np = np.zeros((cfg.t, fs.nlimbs, B), dtype=np.int32)
    state_np[:, :, :lanes] = np.stack(
        [fs.ints_to_mont_plane(row) for row in vals], axis=0
    )
    sample = list(range(0, lanes, 37))
    oracle = {}
    for b in sample:
        o = OraclePoseidonSponge(cfg)
        o.state = [vals[i][b] for i in range(cfg.t)]
        o.permute()
        oracle[b] = o.state

    results = {}
    for pipelined in (False, True):
        fn = cios_permute_fn(cfg, pipelined=pipelined)
        state = jnp.asarray(state_np)
        out = fn(state)
        sub = np.asarray(out[:, :, :lanes])
        for b in sample:
            got = [fs.mont_limbs_to_int(sub[i][:, b]) for i in range(cfg.t)]
            assert got == oracle[b], f"parity failure (pipelined={pipelined}) lane {b}"
        t0 = time.time()
        for _ in range(args.reps):
            out = fn(out)
        _ = np.asarray(out[0, 0, :4])
        rate = B / ((time.time() - t0) / args.reps)
        results["pipelined" if pipelined else "serial"] = round(rate)
        print(json.dumps({"variant": "pipelined" if pipelined else "serial",
                          "perms_per_sec": round(rate), "parity": "ok"}))

    ratio = results["pipelined"] / results["serial"]
    print(json.dumps({"speedup_pipelined_vs_serial": round(ratio, 4)}))


if __name__ == "__main__":
    main()
