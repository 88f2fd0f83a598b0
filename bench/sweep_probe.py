"""Sweep (pipelined, sublanes) kernel variants on the local accelerator.

Follow-up to bench/latency_probe.py (which showed a bare modmul chain is
latency-bound: interleaving two independent chains ran 1.75x faster): the
3-way chain-interleaved kernel at sublanes=16 LOST 10%, suggesting register
pressure; smaller tiles cut the live set per chain.  Each variant is
parity-checked on random states before timing.

Run: python bench/sweep_probe.py [pipelined:sublanes[:lane_streams] ...]
  e.g. python bench/sweep_probe.py 1:8 0:8 0:16:2
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
    ] or [(1, 8, 1), (0, 8, 1)]

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

    for pipelined, sublanes, streams in variants:
        fn = cios_permute_fn(
            cfg, sublanes=sublanes, pipelined=bool(pipelined),
            lane_streams=streams,
        )
        out = fn(jnp.asarray(state_np))
        sub = np.asarray(out[:, :, :lanes])
        for b in sample:
            got = [fs.mont_limbs_to_int(sub[i][:, b]) for i in range(cfg.t)]
            assert got == oracle[b], (pipelined, sublanes, streams, b)
        t0 = time.time()
        reps = 8
        for _ in range(reps):
            out = fn(out)
        _ = np.asarray(out[0, 0, :4])
        rate = B / ((time.time() - t0) / reps)
        print(json.dumps({
            "pipelined": bool(pipelined), "sublanes": sublanes,
            "lane_streams": streams, "perms_per_sec": round(rate),
            "parity": "ok",
        }))


if __name__ == "__main__":
    main()
