"""BabyBear on-TPU parity + throughput probe (Poseidon and Poseidon2).

3-limb elements; rate-8/capacity-8 states (t = 16) carry 32 bytes per
permutation.  Poseidon2's REDC-free linear layers dominate at this width —
Poseidon's dense 16x16 Montgomery MDS costs t^2 L^2 per full round while
Poseidon2's block-circulant M_E is plain small-int scaling.  Parity-gated
against the scalar oracles before timing.

Measured on v5e (B = 2^20): Poseidon 25.8M perms/s (0.82 GB/s);
Poseidon2 64.5M perms/s (2.06 GB/s).

Run: python bench/babybear_probe.py
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
        BABYBEAR_FR as BB,
        OraclePoseidon2Sponge,
        get_default_poseidon_parameters,
        get_default_poseidon2_parameters,
    )
    from sponge_tpu.ops.pallas_cios import cios_permute_fn
    from sponge_tpu.ops.pallas_p2 import p2_permute_fn
    from sponge_tpu.poseidon.oracle import OraclePoseidonSponge

    B = 1 << 20
    lanes = 256
    rng = np.random.default_rng(7)
    for label, cfg, fac, ocls in (
        ("poseidon", get_default_poseidon_parameters(BB, 8),
         cios_permute_fn, OraclePoseidonSponge),
        ("poseidon2", get_default_poseidon2_parameters(BB, 8),
         p2_permute_fn, OraclePoseidon2Sponge),
    ):
        t = cfg.t
        vals = [
            [int(v) % BB.modulus for v in rng.integers(0, 1 << 62, size=lanes)]
            for _ in range(t)
        ]
        st = np.zeros((t, BB.nlimbs, B), dtype=np.int32)
        st[:, :, :lanes] = np.stack(
            [BB.ints_to_mont_plane(r) for r in vals], axis=0
        )
        fn = fac(cfg)
        out = fn(jnp.asarray(st))
        on = np.asarray(out[:, :, :lanes])
        for b in range(0, lanes, 51):
            o = ocls(cfg)
            o.state = [vals[i][b] for i in range(t)]
            o.permute()
            got = [BB.mont_limbs_to_int(on[i][:, b]) for i in range(t)]
            if got != o.state:
                raise RuntimeError(f"{label} PARITY FAILURE at lane {b}")
            raw = [BB.limbs_to_int(on[i][:, b]) for i in range(t)]
            if any(v >= 2 * BB.modulus for v in raw):
                raise RuntimeError(f"{label} output invariant (< 2p) violated")
        pps = time_perms(fn, out, B, iters=20)
        print(
            json.dumps(
                {
                    "metric": f"babybear_rate8_{label}_perms_per_sec",
                    "value": int(pps),
                    "unit": "perms/s",
                    "bytes_per_sec": int(pps * 32),
                    "parity": "ok",
                }
            )
        )


if __name__ == "__main__":
    main()
