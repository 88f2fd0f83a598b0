"""Probe: grouped-CIOS kernel vs vectorized kernel for wide states (t >= 5).

The lazy-REDC CIOS kernel historically refused t >= 5 (int32 column bound);
grouped accumulation (_mds_groups) lifts that.  This probe parity-checks and
times both Pallas tiers on the default BLS12-381 rate-4 (t=5) and rate-8 (t=9)
configs to pick the dispatch threshold in poseidon/permutation.py.

Run: python bench/wide_probe.py [rates...]   (default: 4 8)
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
    rates = [int(a) for a in sys.argv[1:]] or [4, 8]

    from sponge_tpu.utils.jaxcache import configure_cache

    configure_cache("/tmp/sponge_tpu_jax_cache")

    from sponge_tpu import BLS12_381_FR, get_default_poseidon_parameters
    from sponge_tpu.ops.pallas_cios import cios_permute_fn
    from sponge_tpu.ops.pallas_permute import pallas_permute_fn
    from sponge_tpu.poseidon.oracle import OraclePoseidonSponge

    B = 1 << 16
    rng = np.random.default_rng(2)
    fs = BLS12_381_FR

    for rate in rates:
        cfg = get_default_poseidon_parameters(fs, rate, False)
        vals = [
            [int.from_bytes(rng.bytes(40), "little") % fs.modulus for _ in range(B)]
            for _ in range(cfg.t)
        ]
        state_np = np.stack([fs.ints_to_mont_plane(v) for v in vals])
        sample = [0, 1, B // 3, B - 1]
        oracle = {}
        for b in sample:
            o = OraclePoseidonSponge(cfg)
            o.state = [vals[i][b] for i in range(cfg.t)]
            o.permute()
            oracle[b] = o.state

        for tier, make in (
            ("cios-grouped", lambda: cios_permute_fn(cfg)),
            ("pallas-vectorized", lambda: pallas_permute_fn(cfg)),
        ):
            t0 = time.time()
            fn = make()
            out = fn(jnp.asarray(state_np))
            sub = np.asarray(out)
            compile_s = time.time() - t0
            for b in sample:
                got = [fs.mont_limbs_to_int(sub[i][:, b]) for i in range(cfg.t)]
                assert got == oracle[b], (rate, tier, b)
            reps = 6
            t0 = time.time()
            for _ in range(reps):
                out = fn(out)
            _ = np.asarray(out[0, 0, :4])
            rate_ps = B / ((time.time() - t0) / reps)
            print(
                json.dumps(
                    {
                        "rate": rate,
                        "t": cfg.t,
                        "alpha": cfg.alpha,
                        "tier": tier,
                        "perms_per_sec": round(rate_ps),
                        "compile_s": round(compile_s, 1),
                        "parity": "ok",
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
