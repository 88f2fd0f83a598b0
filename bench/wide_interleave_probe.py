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

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from _harness import oracle_states, parity_gate, random_state, time_perms


def main():
    variants = [
        tuple(int(x) for x in a.split(":")) for a in sys.argv[1:]
    ] or [(0, 16, 2), (1, 16, 2)]

    from sponge_tpu.utils.jaxcache import configure_cache

    configure_cache("/tmp/sponge_tpu_jax_cache")

    from sponge_tpu import BLS12_381_FR, get_default_poseidon_parameters
    from sponge_tpu.ops.pallas_cios import cios_permute_fn

    cfg = get_default_poseidon_parameters(BLS12_381_FR, 2, False)
    B = 1 << 20
    lanes = 512
    rng = np.random.default_rng(20260819)
    vals, state_np = random_state(cfg, lanes, B, rng)
    oracle = oracle_states(cfg, vals, lanes, stride=67)

    for wide, sublanes, streams in variants:
        fn = cios_permute_fn(
            cfg, sublanes=sublanes, lane_streams=streams,
            wide_interleave=bool(wide),
        )
        out = fn(jnp.asarray(state_np))
        parity_gate(cfg, out, vals, lanes,
                    f"wide={wide} {sublanes}:{streams}", stride=67,
                    oracle=oracle)
        rate = time_perms(fn, out, B, iters=8)
        print(json.dumps({
            "wide_interleave": bool(wide), "sublanes": sublanes,
            "lane_streams": streams, "perms_per_sec": round(rate),
            "parity": "ok",
        }), flush=True)


if __name__ == "__main__":
    main()
