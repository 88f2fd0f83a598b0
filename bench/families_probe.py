"""Griffin / Anemoi / Jive on-TPU parity + throughput probe.

Griffin and Anemoi are the wide-exponent "algebraic" families (one
x^(1/alpha) ladder per round), so like Rescue their throughput is
designed-in far below Poseidon/Monolith — but unlike Rescue the ladder
applies to ONE element (Griffin) or advances ALL l Flystel pairs at once
(Anemoi), so their measured cost quantifies that structural saving.  The
Jive row measures the Anemoi paper's permutation-mode 2-to-1 Merkle
compression (ePrint 2022/840 §4) at its native t=2 width.

Every row parity-gates the compiled tier against the scalar python-int
oracle before timing (the probe refuses to print a number on mismatch),
like bench/rescue_probe.py.

Run: python bench/families_probe.py
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


from _harness import oracle_states, parity_gate, random_state, time_perms


def main():
    from sponge_tpu.utils.jaxcache import configure_cache
    configure_cache("/tmp/sponge_tpu_jax_cache")

    from sponge_tpu import (
        BLS12_381_FR as FR,
        GOLDILOCKS_FR as GL,
        OracleAnemoiSponge,
        OracleGmimcSponge,
        OracleGriffinSponge,
        get_default_anemoi_parameters,
        get_default_gmimc_parameters,
        get_default_griffin_parameters,
    )
    from sponge_tpu.anemoi.permutation import anemoi_permute_jit
    from sponge_tpu.gmimc.permutation import gmimc_permute_jit
    from sponge_tpu.griffin.permutation import griffin_permute_jit
    from sponge_tpu.hash import jive_compress_pairs

    rng = np.random.default_rng(20260818)
    lanes = 64
    rows = []

    from sponge_tpu.ops.pallas_anemoi import anemoi_permute_fn
    from sponge_tpu.ops.pallas_griffin import griffin_permute_fn

    only = sys.argv[1] if len(sys.argv) > 1 else None
    cases = (
        ("griffin_bls381_rate2", get_default_griffin_parameters(FR, 2),
         OracleGriffinSponge, griffin_permute_jit, griffin_permute_fn, 1 << 17),
        ("griffin_goldilocks_rate4", get_default_griffin_parameters(GL, 4),
         OracleGriffinSponge, griffin_permute_jit, griffin_permute_fn, 1 << 18),
        ("anemoi_bls381_rate3", get_default_anemoi_parameters(FR, 3),
         OracleAnemoiSponge, anemoi_permute_jit, anemoi_permute_fn, 1 << 17),
        ("anemoi_goldilocks_rate4", get_default_anemoi_parameters(GL, 4),
         OracleAnemoiSponge, anemoi_permute_jit, anemoi_permute_fn, 1 << 18),
        ("gmimc_bls381_rate2", get_default_gmimc_parameters(FR, 2),
         OracleGmimcSponge, gmimc_permute_jit, None, 1 << 17),
        ("gmimc_goldilocks_rate4", get_default_gmimc_parameters(GL, 4),
         OracleGmimcSponge, gmimc_permute_jit, None, 1 << 18),
    )
    for label, cfg, oracle_cls, jit_fn, kernel_fn, B in cases:
        if only and only not in label:
            continue
        vals, state_np = random_state(cfg, lanes, B, rng)
        oracle = oracle_states(cfg, vals, lanes)
        tiers = [("", jit_fn(cfg))]
        if kernel_fn is not None:
            tiers.append(("_kernel", kernel_fn(cfg)))
        for suffix, fn in tiers:
            out = fn(jnp.asarray(state_np))
            parity_gate(cfg, out, vals, lanes, f"{label}{suffix}", oracle=oracle)
            pps = time_perms(fn, out, B, iters=5)
            rows.append({"metric": f"{label}{suffix}_perms_per_sec",
                         "value": int(pps), "unit": "perms/s"})
            print(json.dumps(rows[-1]), flush=True)

    # --- Jive_2 compression at Anemoi's native t=2 width (one perm/node) ---
    cfg_j = get_default_anemoi_parameters(FR, 1)
    fs = cfg_j.field
    B = 1 << 16
    def _digest_plane():
        vals = [int(v) % fs.modulus for v in rng.integers(0, 1 << 62, size=lanes)]
        plane = np.zeros((1, fs.nlimbs, B), dtype=np.int32)
        plane[0, :, :lanes] = fs.ints_to_mont_plane(vals)
        return [vals], plane

    vals_l, left_np = _digest_plane()
    vals_r, right_np = _digest_plane()

    @jax.jit
    def jive_fn(a, b):
        return jive_compress_pairs(cfg_j, a, b)

    left = jnp.asarray(left_np)
    right = jnp.asarray(right_np)
    out = jive_fn(left, right)
    out_np = np.asarray(out[:, :, :lanes])
    for b in range(0, lanes, 13):
        o = OracleAnemoiSponge(cfg_j)
        x = [vals_l[0][b], vals_r[0][b]]
        o.state = list(x)
        o.permute()
        want = (x[0] + x[1] + o.state[0] + o.state[1]) % fs.modulus
        got = fs.mont_limbs_to_int(out_np[0][:, b]) % fs.modulus
        if got != want:
            raise RuntimeError(f"jive PARITY FAILURE at lane {b}")
    iters = 5
    cur = out
    t0 = time.perf_counter()
    for _ in range(iters):
        cur = jive_fn(cur, right)
    _ = np.asarray(cur[0, 0, :8])
    dt = time.perf_counter() - t0
    rows.append({
        "metric": "jive2_anemoi_bls381_compressions_per_sec",
        "value": int(iters * B / dt),
        "unit": "compressions/s",
    })
    print(json.dumps(rows[-1]))


if __name__ == "__main__":
    main()
