"""A/B: 12-bit/L=22 vs 13-bit/L=20 limb plan for BLS12-381 Fr (DESIGN §25).

DESIGN §24 closed with "the remaining levers are algorithmic: fewer limbs
(a 13-bit plan would cut L from 22 to 20)".  This probe measures that plan:
the same production CIOS kernel (relaxed norm, 16:2 lane streams, optimized
partial rounds) instantiated over ``BLS12_381_FR_L13``:

  * ~17% fewer schoolbook products per modmul ((20/22)^2);
  * uint32 column accumulation (the worst column exceeds 2^31; issue rate
    measured identical to int32 — bench/uint32_probe.py);
  * the cost side: MDS/row0 dots split into TWO accumulation groups at
    t = 3 (the 64-term uint32 budget holds g*L + L - 1 <= 64 at L = 20),
    i.e. one extra REDC per MDS row and per sparse partial round.

Protocol: parity-gate both plans against the scalar oracle, then
warm+best-of-3 windows (bench/_harness.time_perms), with the 12-bit
baseline re-measured AFTER the candidate as order control.

Run: python bench/limb13_probe.py [rate]
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np

import jax.numpy as jnp

from _harness import parity_gate, random_state, time_perms


def measure(cfg, B, label, iters=5):
    from sponge_tpu.ops.pallas_cios import cios_permute_fn

    rng = np.random.default_rng(42)
    lanes = 64
    vals, state_np = random_state(cfg, lanes, B, rng)
    fn = cios_permute_fn(cfg)
    out = fn(jnp.asarray(state_np))
    parity_gate(cfg, out, vals, lanes, label)
    return time_perms(fn, out, B, iters=iters)


def main():
    from sponge_tpu.utils.jaxcache import configure_cache

    configure_cache("/tmp/sponge_tpu_jax_cache")

    from sponge_tpu import get_default_poseidon_parameters
    from sponge_tpu.fields import BLS12_381_FR, BLS12_381_FR_L13

    rate = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    B = 1 << 20 if rate == 2 else 1 << 18
    cfg12 = get_default_poseidon_parameters(BLS12_381_FR, rate, False)
    cfg13 = get_default_poseidon_parameters(BLS12_381_FR_L13, rate, False)
    assert cfg13.field.nlimbs == 20 and cfg13.field.unsigned_accum

    r12_a = measure(cfg12, B, "bls_l22_pre")
    r13 = measure(cfg13, B, "bls_l20_13bit")
    r12_b = measure(cfg12, B, "bls_l22_post")  # order control
    base = max(r12_a, r12_b)
    print(
        json.dumps(
            {
                "rate": rate,
                "B": B,
                "l22_12bit_pre": int(r12_a),
                "l20_13bit": int(r13),
                "l22_12bit_post": int(r12_b),
                "speedup_vs_best_baseline": round(r13 / base, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
