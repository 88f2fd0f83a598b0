"""Measure the relaxed (chain-free epsilon-redundant normalization) CIOS
kernel against the exact-norm production kernel on the local accelerator.

The relaxed kernel (ops/pallas_cios.py `_relaxed_norm_multi`) removes the
L-step sequential carry chain after every REDC from the round schedule,
trading it for 2 parallel split-carry passes (2x the normalization ops, zero
dependency chain) and quasi-canonical limbs (<= 2^12 + 128) between rounds.
If the kernel is REDC-LATENCY-bound (the standing hypothesis, ROADMAP.md),
this wins; if it is VPU-throughput-bound, it loses ~the extra norm ops.

Each variant is parity-checked on random states before timing.

Run: python bench/relaxed_probe.py [relaxed:sublanes:lane_streams ...]
  e.g. python bench/relaxed_probe.py 0:16:2 1:16:2 1:16:1
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


def main():
    variants = [
        (tuple(int(x) for x in a.split(":")) + (1,))[:3] for a in sys.argv[1:]
    ] or [(0, 16, 2), (1, 16, 2), (1, 16, 1)]

    from sponge_tpu.utils.jaxcache import configure_cache

    configure_cache("/tmp/sponge_tpu_jax_cache")

    import bench as root_bench
    from sponge_tpu import BLS12_381_FR, get_default_poseidon_parameters
    from sponge_tpu.ops.pallas_cios import cios_permute_fn
    from sponge_tpu.poseidon.oracle import OraclePoseidonSponge

    cfg = get_default_poseidon_parameters(BLS12_381_FR, 2, False)
    fs = cfg.field
    B = 1 << 20

    lanes = 512
    vals = root_bench._random_state_ints(cfg, lanes)
    state_np = np.zeros((cfg.t, fs.nlimbs, B), dtype=np.int32)
    state_np[:, :, :lanes] = np.stack(
        [fs.ints_to_mont_plane(row) for row in vals], axis=0
    )
    sample = list(range(0, lanes, 67))
    oracle = {}
    for b in sample:
        o = OraclePoseidonSponge(cfg)
        o.state = [vals[i][b] for i in range(cfg.t)]
        o.permute()
        oracle[b] = o.state

    for relaxed, sublanes, streams in variants:
        fn = cios_permute_fn(
            cfg, sublanes=sublanes, lane_streams=streams, relaxed=bool(relaxed)
        )
        out = fn(jnp.asarray(state_np))
        sub = np.asarray(out[:, :, :lanes])
        for b in sample:
            got = [fs.mont_limbs_to_int(sub[i][:, b]) for i in range(cfg.t)]
            assert got == oracle[b], (relaxed, sublanes, streams, b)
        t0 = time.time()
        reps = 8
        for _ in range(reps):
            out = fn(out)
        _ = np.asarray(out[0, 0, :4])
        rate = B / ((time.time() - t0) / reps)
        print(json.dumps({
            "relaxed": bool(relaxed), "sublanes": sublanes,
            "lane_streams": streams, "perms_per_sec": round(rate),
            "parity": "ok",
        }), flush=True)


if __name__ == "__main__":
    main()
