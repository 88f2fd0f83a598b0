"""Deterministic Griffin parameter generation.

Structure (linear layer, nonlinear layer, round shape) follows ePrint
2022/403; the linear matrices are shared with Poseidon2
(``poseidon2.params.external_matrix``).  ``alpha`` is the smallest prime d
with gcd(d, p-1) = 1 — the paper's choice (d in {3, 5, 7, ...}).

Round-count provenance: the paper's round numbers come from its Groebner-
basis cost analysis, whose tables are not reachable for cross-validation in
this offline environment.  The defaults below are a CONSERVATIVE envelope —
at or above every 128-bit-security instance proposed in the paper for the
supported widths (the paper's counts *decrease* with both d and t; its
largest proposal is at d=3, t=3):

    d = 3 -> 16 rounds, d = 5 -> 14, d >= 7 -> 12

Deployments matching a published instance should pass ``rounds=`` (and, for
published constants, construct ``GriffinConfig`` directly); every tier is
constant- and round-count-agnostic.  The paper analyzes large fields only,
so defaults require log2(p) >= 60 — smaller fields (the 31-bit family) must
pass an explicit, externally-justified round count.

Constants provenance: like Poseidon2/Rescue (poseidon2/params.py), the
round constants and the quadratic base pair (a, b) are a *self-consistent
deterministic instance* drawn from the reference's Grain-LFSR machinery
(/root/reference/src/poseidon/grain_lfsr.rs via ``poseidon.params``): the
rc rows by rejection sampling, then (a, b) redrawn until a != 0 and
a^2 - 4b is a quadratic non-residue (the permutation-property requirement,
griffin/config.py).
"""

from __future__ import annotations

import functools

from ..fields import FieldSpec
from ..poseidon.params import _DEFAULT_CAPACITY, PoseidonGrainLFSR
from ..poseidon2.params import external_matrix
from ..rescue.params import smallest_alpha
from .config import GriffinConfig, is_quadratic_nonresidue


def griffin_default_rounds(alpha: int) -> int:
    """Conservative default round count (see module docstring provenance)."""
    if alpha <= 3:
        return 16
    if alpha <= 5:
        return 14
    return 12


def generate_griffin_parameters(
    fs: FieldSpec,
    rate: int,
    capacity: int = 1,
    alpha: int | None = None,
    rounds: int | None = None,
) -> GriffinConfig:
    """Deterministic Griffin parameters for any supported (field, rate,
    capacity); see module docstring for round-count and constants provenance."""
    t = rate + capacity
    p = fs.modulus
    if alpha is None:
        alpha = smallest_alpha(p)
    if rounds is None:
        if fs.modulus_bit_size < 60:
            raise ValueError(
                "Griffin's published security analysis covers large fields "
                f"only; pass rounds= explicitly for {fs.name} "
                f"({fs.modulus_bit_size} bits)"
            )
        rounds = griffin_default_rounds(alpha)
    mat_e = external_matrix(t)  # raises for unsupported widths
    lfsr = PoseidonGrainLFSR(False, fs.modulus_bit_size, t, rounds, 0)
    rc = tuple(
        tuple(lfsr.get_field_elements_rejection_sampling(fs, t))
        for _ in range(rounds - 1)
    )
    while True:
        a = lfsr.get_field_elements_rejection_sampling(fs, 1)[0]
        b = lfsr.get_field_elements_rejection_sampling(fs, 1)[0]
        if a != 0 and is_quadratic_nonresidue((a * a - 4 * b) % p, p):
            break
    return GriffinConfig(
        field=fs,
        rounds=rounds,
        alpha=alpha,
        mat_e=mat_e,
        rc=rc,
        qc_alpha=a,
        qc_beta=b,
        rate=rate,
        capacity=capacity,
    )


@functools.lru_cache(maxsize=None)
def get_default_griffin_parameters(fs: FieldSpec, rate: int) -> GriffinConfig:
    """Default Griffin parameters: paper-smallest alpha, conservative round
    count, per-field sponge capacity (same defaults as the other families:
    1 for ~255-bit fields, 4 for Goldilocks)."""
    capacity = _DEFAULT_CAPACITY.get(fs.name, 1)
    return generate_griffin_parameters(fs, rate, capacity)
