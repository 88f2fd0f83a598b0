"""Measure the wide-interleave CIOS emission against the production 2-way
lane-stream interleave on the local accelerator.

The round-3 latency accounting (bench/latency_accounting_probe.py,
docs/DESIGN.md §21) shows ~92% of the 255-bit kernel's per-permutation
latency is REDC chains interleaved only ``lane_streams``-way (2 in
production) while 6-8 independent chains exist at each schedule point:
t*ns full-round S-boxes, t*ns MDS output rows per accumulation group, and
(G + t - 1)*ns sparse column lists per optimized partial round.
``wide_interleave=True`` emits each such set as ONE ``_redc_multi`` /
``_pow_alpha_multi`` call — arithmetic identical, only emission order
changes.  If the kernel is chain-LATENCY-bound this wins; if the Mosaic
scheduler already overlaps the chains (or register pressure forces VMEM
spills at the wider live set), it loses.

Each variant is parity-checked on random states before timing.

Run: python bench/wide_interleave_probe.py [wide:sublanes:lane_streams ...]
  e.g. python bench/wide_interleave_probe.py 0:16:2 1:16:2 1:8:2
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
        tuple(int(x) for x in a.split(":")) for a in sys.argv[1:]
    ] or [(0, 16, 2), (1, 16, 2), (1, 8, 2)]

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

    for wide, sublanes, streams in variants:
        fn = cios_permute_fn(
            cfg, sublanes=sublanes, lane_streams=streams,
            wide_interleave=bool(wide),
        )
        out = fn(jnp.asarray(state_np))
        sub = np.asarray(out[:, :, :lanes])
        for b in sample:
            got = [fs.mont_limbs_to_int(sub[i][:, b]) for i in range(cfg.t)]
            assert got == oracle[b], (wide, sublanes, streams, b)
        t0 = time.time()
        reps = 8
        for _ in range(reps):
            out = fn(out)
        _ = np.asarray(out[0, 0, :4])
        rate = B / ((time.time() - t0) / reps)
        print(json.dumps({
            "wide_interleave": bool(wide), "sublanes": sublanes,
            "lane_streams": streams, "perms_per_sec": round(rate),
            "parity": "ok",
        }), flush=True)


if __name__ == "__main__":
    main()
