"""Goldilocks on-TPU parity + throughput probe (Poseidon and Poseidon2).

6-limb elements make every Montgomery reduction (6/22)^2 ~ 13x cheaper than
the 255-bit fields; rate-8 t=12 states carry 64 bytes per permutation.
Parity-gated against the scalar oracles before timing, like bench/p2_probe.py.

Run: python bench/goldilocks_probe.py
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
    from sponge_tpu.utils.jaxcache import configure_cache
    configure_cache("/tmp/sponge_tpu_jax_cache")

    from sponge_tpu import (
        GOLDILOCKS_FR as GL,
        OraclePoseidon2Sponge,
        get_default_poseidon_parameters,
        get_default_poseidon2_parameters,
    )
    from sponge_tpu.ops.pallas_cios import cios_permute_fn
    from sponge_tpu.ops.pallas_p2 import p2_permute_fn
    from sponge_tpu.poseidon.oracle import OraclePoseidonSponge

    B = 1 << 20
    lanes = 256
    rng = np.random.default_rng(20260817)

    for label, cfg, fn_factory, oracle_cls in (
        ("poseidon", get_default_poseidon_parameters(GL, 8),
         cios_permute_fn, OraclePoseidonSponge),
        ("poseidon2", get_default_poseidon2_parameters(GL, 8),
         p2_permute_fn, OraclePoseidon2Sponge),
    ):
        t = cfg.t
        vals = [
            [int(v) % GL.modulus for v in rng.integers(0, 1 << 62, size=lanes)]
            for _ in range(t)
        ]
        state_np = np.zeros((t, GL.nlimbs, B), dtype=np.int32)
        state_np[:, :, :lanes] = np.stack(
            [GL.ints_to_mont_plane(row) for row in vals], axis=0
        )
        fn = fn_factory(cfg)
        out = fn(jnp.asarray(state_np))
        out_np = np.asarray(out[:, :, :lanes])
        for b in range(0, lanes, 51):
            o = oracle_cls(cfg)
            o.state = [vals[i][b] for i in range(t)]
            o.permute()
            got = [GL.mont_limbs_to_int(out_np[i][:, b]) for i in range(t)]
            if got != o.state:
                raise RuntimeError(f"{label} PARITY FAILURE at lane {b}")
            raw = [GL.limbs_to_int(out_np[i][:, b]) for i in range(t)]
            if any(v >= 2 * GL.modulus for v in raw):
                raise RuntimeError(f"{label} output invariant (< 2p) violated")
        pps = time_perms(fn, out, B, iters=20)
        print(
            json.dumps(
                {
                    "metric": f"goldilocks_rate8_{label}_perms_per_sec",
                    "value": int(pps),
                    "unit": "perms/s",
                    "bytes_per_sec": int(pps * 64),
                    "parity": "ok",
                }
            )
        )


if __name__ == "__main__":
    main()
