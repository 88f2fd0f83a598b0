"""Tracing / profiling / metrics for sponge workloads.

The reference's only observability is ``tracing`` spans on every R1CS gadget
method (SURVEY.md §5; /root/reference/src/poseidon/constraints.rs:38ff).  The
TPU-native equivalents here:

* ``trace``: context manager around ``jax.profiler`` producing a TensorBoard-
  compatible trace directory (the analogue of attaching a tracing subscriber);
* ``annotate``: named scope so kernels show up with readable names in traces;
* ``ThroughputMeter``: permutations/sec counter with completion forced via a
  host fetch (``block_until_ready`` is unreliable through the axon tunnel);
* ``op_counts``: static per-permutation arithmetic cost model of each kernel
  tier — the counter the reference exposes as R1CS constraint counts, recast
  for performance accounting.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import numpy as np

import jax

from ..poseidon.config import PoseidonConfig


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed block (view in TensorBoard/
    Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.named_scope


@dataclass
class ThroughputMeter:
    """Measures sustained permutations/sec of a state->state step function."""

    reps: int = 8

    def measure(self, step_fn, state) -> float:
        out = step_fn(state)
        _ = np.asarray(out[(0,) * (out.ndim - 1)][:4])  # sync through the tunnel
        t0 = time.time()
        for _ in range(self.reps):
            out = step_fn(out)
        _ = np.asarray(out[(0,) * (out.ndim - 1)][:4])
        dt = (time.time() - t0) / self.reps
        return out.shape[-1] / dt


def sbox_muls(alpha: int) -> int:
    """Field multiplies per S-box application (square-and-multiply chain)."""
    bits = bin(alpha)[2:]
    return (len(bits) - 1) + bits[1:].count("1")


def op_counts(cfg: PoseidonConfig) -> dict:
    """Static per-permutation arithmetic accounting for ``cfg``.

    ``field_muls`` counts Montgomery multiplies exactly as the scalar reference
    performs them (mod.rs:95-118); ``int32_muls_cios`` estimates the unrolled
    CIOS kernel's 32-bit multiply count per lane (schoolbook 2L^2-ish per field
    mul, MDS rows sharing reductions).
    """
    L = cfg.field.nlimbs
    t = cfg.t
    s = sbox_muls(cfg.alpha)
    sbox_apps = cfg.full_rounds * t + cfg.partial_rounds
    field_muls = sbox_apps * s + cfg.rounds * t * t  # sbox + MDS
    # CIOS kernel: per field-mul ~ L^2 (schoolbook) + (L-1)^2-ish (REDC);
    # per MDS row: t*L^2 products + one REDC.
    redc = sum(1 for pk in cfg.field.int_to_limbs(cfg.field.modulus) if pk) * L
    per_mul = L * L + redc
    mds_per_round = t * (t * L * L + redc)
    int32_muls = sbox_apps * s * per_mul + cfg.rounds * mds_per_round
    return {
        "rounds": cfg.rounds,
        "sbox_applications": sbox_apps,
        "sbox_muls_each": s,
        "field_muls": field_muls,
        "int32_muls_cios_per_lane": int32_muls,
        "r1cs_constraints_per_permutation": s * sbox_apps,
    }
