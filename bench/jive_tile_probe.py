"""Anemoi t=2 (Jive width) tile-shape probe: 8:1 vs 16:2.

At t = 2 Anemoi has a single Flystel column (l = 1), so the family default
tile (8 sublanes / 1 stream — chosen because the l-pair chains interleave
without the stream split, docs/DESIGN.md §22) carries exactly ONE REDC
chain through the ~330-product inverse ladder.  Griffin, the other
1-chain-per-stream family, measured 16:2 ahead of 8:1 for precisely this
reason.  This probe times the fused t=2 kernel at both tiles (each output
oracle parity-gated first, order-controlled: 8:1 is re-measured after
16:2) so the Jive-width tile default is a measurement, not an analogy.

Prints one JSON line per timing window.
"""

from __future__ import annotations

import json
import pathlib
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from _harness import oracle_states, parity_gate, random_state, time_perms


def main():
    from sponge_tpu.utils.jaxcache import configure_cache

    configure_cache("/tmp/sponge_tpu_jax_cache")

    from sponge_tpu import BLS12_381_FR as FR
    from sponge_tpu import get_default_anemoi_parameters
    from sponge_tpu.ops.pallas_anemoi import anemoi_permute_fn

    cfg = get_default_anemoi_parameters(FR, 1)  # t = 2: the Jive_2 width
    rng = np.random.default_rng(20260819)
    lanes = 64
    B = 1 << 16

    vals, state_np = random_state(cfg, lanes, B, rng)
    state = jnp.asarray(state_np)
    oracle = oracle_states(cfg, vals, lanes)

    fns = {
        (8, 1): anemoi_permute_fn(cfg, sublanes=8, lane_streams=1),
        (16, 2): anemoi_permute_fn(cfg, sublanes=16, lane_streams=2),
    }
    # Order control (bench/_harness.py caveat): baseline, candidate, baseline.
    for sublanes, streams in ((8, 1), (16, 2), (8, 1)):
        fn = fns[(sublanes, streams)]
        out = fn(state)
        parity_gate(cfg, out, vals, lanes, f"anemoi_t2_{sublanes}x{streams}",
                    oracle=oracle)
        pps = time_perms(fn, out, B, iters=5)
        print(
            json.dumps(
                {
                    "metric": f"anemoi_t2_bls381_tile{sublanes}x{streams}_perms_per_sec",
                    "value": int(pps),
                    "unit": "perms/s",
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
