"""KoalaBear on-TPU parity + throughput probe (Poseidon and Poseidon2).

Same 3-limb / t=16 shape as BabyBear, but alpha = 3 — the cheapest S-box of
any shipped field (2 Montgomery muls) traded against R_P = 20 partial rounds
(vs BabyBear's 13).  The Poseidon CIOS kernel and the Poseidon2 kernel both
run unmodified; the XLA tier routes to the value-safe rho-folding round for
this config (see poseidon/permutation.py check_value_bounds).  Parity-gated
against the scalar oracles before timing.

Run: python bench/koalabear_probe.py
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
        KOALABEAR_FR as KB,
        OraclePoseidon2Sponge,
        get_default_poseidon_parameters,
        get_default_poseidon2_parameters,
    )
    from sponge_tpu.ops.pallas_cios import cios_permute_fn
    from sponge_tpu.ops.pallas_p2 import p2_permute_fn
    from sponge_tpu.poseidon.oracle import OraclePoseidonSponge

    B = 1 << 20
    lanes = 256
    rng = np.random.default_rng(127)
    for label, cfg, fac, ocls in (
        ("poseidon", get_default_poseidon_parameters(KB, 8),
         cios_permute_fn, OraclePoseidonSponge),
        ("poseidon2", get_default_poseidon2_parameters(KB, 8),
         p2_permute_fn, OraclePoseidon2Sponge),
    ):
        t = cfg.t
        vals = [
            [int(v) % KB.modulus for v in rng.integers(0, 1 << 62, size=lanes)]
            for _ in range(t)
        ]
        st = np.zeros((t, KB.nlimbs, B), dtype=np.int32)
        st[:, :, :lanes] = np.stack(
            [KB.ints_to_mont_plane(r) for r in vals], axis=0
        )
        fn = fac(cfg)
        out = fn(jnp.asarray(st))
        on = np.asarray(out[:, :, :lanes])
        for b in range(0, lanes, 51):
            o = ocls(cfg)
            o.state = [vals[i][b] for i in range(t)]
            o.permute()
            got = [KB.mont_limbs_to_int(on[i][:, b]) for i in range(t)]
            if got != o.state:
                raise RuntimeError(f"{label} PARITY FAILURE at lane {b}")
            raw = [KB.limbs_to_int(on[i][:, b]) for i in range(t)]
            if any(v >= 2 * KB.modulus for v in raw):
                raise RuntimeError(f"{label} output invariant (< 2p) violated")
        pps = time_perms(fn, out, B, iters=20)
        print(
            json.dumps(
                {
                    "metric": f"koalabear_rate8_{label}_perms_per_sec",
                    "value": int(pps),
                    "unit": "perms/s",
                    "bytes_per_sec": int(pps * 32),
                    "parity": "ok",
                }
            )
        )


if __name__ == "__main__":
    main()
