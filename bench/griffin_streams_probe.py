"""Griffin fused-kernel lane-stream sweep on the local accelerator.

Griffin's ladder phase is the least chain-parallel in the repo — ONE
x^(1/d) chain per lane stream — so unlike Rescue (t*ns chains) and Anemoi
(l*ns), its REDC latency hiding scales directly with ``lane_streams``.
This probe sweeps the stream count at constant tile footprint trade-offs:
16 sublanes / 2 streams (the framework default), 32/4, and 32/2 (separates
the wider-tile effect from the interleave effect).

Each variant is parity-checked against the scalar oracle before timing.

Run: python bench/griffin_streams_probe.py [sublanes:lane_streams ...]
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from _harness import oracle_states, parity_gate, random_state, time_perms


def main():
    variants = [
        tuple(int(x) for x in a.split(":")) for a in sys.argv[1:]
    ] or [(16, 2), (32, 2), (32, 4)]

    from sponge_tpu.utils.jaxcache import configure_cache

    configure_cache("/tmp/sponge_tpu_jax_cache")

    from sponge_tpu import BLS12_381_FR as FR, OracleGriffinSponge
    from sponge_tpu.griffin.params import get_default_griffin_parameters
    from sponge_tpu.ops.pallas_griffin import griffin_permute_fn

    cfg = get_default_griffin_parameters(FR, 2)
    B = 1 << 17
    lanes = 64
    rng = np.random.default_rng(20260819)
    vals, state_np = random_state(cfg, lanes, B, rng)
    oracle = oracle_states(cfg, vals, lanes)

    for sublanes, streams in variants:
        fn = griffin_permute_fn(cfg, sublanes=sublanes, lane_streams=streams)
        out = fn(jnp.asarray(state_np))
        parity_gate(cfg, out, vals, lanes, f"griffin {sublanes}:{streams}",
                    oracle=oracle)
        rate = time_perms(fn, out, B, iters=5)
        print(json.dumps({
            "sublanes": sublanes, "lane_streams": streams,
            "perms_per_sec": round(rate), "parity": "ok",
        }), flush=True)


if __name__ == "__main__":
    main()
