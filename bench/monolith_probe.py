"""Monolith on-TPU parity + throughput probe (fused Pallas kernel).

Monolith does 6 rounds of bitwise Bars + squaring-only Bricks + an MDS
Concrete that is multiplication-free for Goldilocks (power-of-two circulant,
static limb shifts) and a batched Cauchy product for the 31-bit fields.
Parity-gated against the scalar oracle before timing: the probe refuses to
print a number on mismatch.

Run: python bench/monolith_probe.py
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
        BABYBEAR_FR,
        GOLDILOCKS_FR,
        KOALABEAR_FR,
        MERSENNE31_FR,
        OracleMonolithSponge,
        get_default_monolith_parameters,
    )
    from sponge_tpu.ops.pallas_monolith import monolith_kernel_fn

    lanes = 256
    rng = np.random.default_rng(1025)
    B = 1 << 20
    for fs in (GOLDILOCKS_FR, MERSENNE31_FR, KOALABEAR_FR, BABYBEAR_FR):
        cfg = get_default_monolith_parameters(fs)
        t = cfg.t
        vals = [
            [int(v) % fs.modulus for v in rng.integers(0, 1 << 62, size=lanes)]
            for _ in range(t)
        ]
        st = np.zeros((t, fs.nlimbs, B), dtype=np.int32)
        st[:, :, :lanes] = np.stack(
            [fs.ints_to_mont_plane(r) for r in vals], axis=0
        )
        fn = monolith_kernel_fn(cfg)
        out = fn(jnp.asarray(st))
        on = np.asarray(out[:, :, :lanes])
        for b in range(0, lanes, 51):
            o = OracleMonolithSponge(cfg)
            o.state = [vals[i][b] for i in range(t)]
            o.permute()
            got = [fs.mont_limbs_to_int(on[i][:, b]) for i in range(t)]
            if got != o.state:
                raise RuntimeError(f"{fs.name} PARITY FAILURE at lane {b}")
            raw = [fs.limbs_to_int(on[i][:, b]) for i in range(t)]
            if any(v >= 2 * fs.modulus for v in raw):
                raise RuntimeError(f"{fs.name} output invariant (< 2p) violated")
        pps = time_perms(fn, out, B, iters=20)
        rate_bytes = cfg.rate * fs.num_canonical_bytes
        print(
            json.dumps(
                {
                    "metric": f"{fs.name}_monolith_perms_per_sec",
                    "value": int(pps),
                    "unit": "perms/s",
                    "bytes_per_sec": int(pps * rate_bytes),
                    "parity": "ok",
                }
            )
        )


if __name__ == "__main__":
    main()
