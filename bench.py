"""Benchmark harness: Poseidon rate-2 permutations/sec on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The baseline denominator is the BASELINE.json north-star target normalized to a
single chip: 2^24 perms/s on a v5e-16 slice -> 2^20 = 1,048,576 perms/s/chip.
``vs_baseline`` > 1.0 beats the per-chip target.

Timing notes: through the experimental axon tunnel ``block_until_ready`` does not
reliably block, so completion is forced by fetching a result slice to host; the
transfer cost is amortized over many chained kernel executions.
"""

from __future__ import annotations

import json
import time

import numpy as np

PER_CHIP_TARGET = float(1 << 20)  # 2^24 / 16 chips (BASELINE.json north star)


def measure_perms_per_sec(log_batch: int = 20, reps: int = 8) -> float:
    import jax

    # Persistent compilation cache: first-ever run pays the (slow, remote for
    # axon) TPU compile; subsequent bench invocations reuse it.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/sponge_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from sponge_tpu import BLS12_381_FR, get_default_poseidon_parameters
    from sponge_tpu.poseidon.permutation import batched_permute, zero_state

    cfg = get_default_poseidon_parameters(BLS12_381_FR, 2, False)
    B = 1 << log_batch
    state = zero_state(cfg, B)

    # Warm-up: compile + one execution, forced to completion via host fetch.
    out = batched_permute(cfg, state)
    _ = np.asarray(out[0, 0, :4])

    t0 = time.time()
    for _ in range(reps):
        out = batched_permute(cfg, out)
    _ = np.asarray(out[0, 0, :4])  # forces the whole chain
    dt = (time.time() - t0) / reps
    return B / dt


def main():
    value = measure_perms_per_sec()
    print(
        json.dumps(
            {
                "metric": "poseidon_rate2_bls12_381_fr_permutations_per_sec_per_chip",
                "value": round(value),
                "unit": "perms/s",
                "vs_baseline": round(value / PER_CHIP_TARGET, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
