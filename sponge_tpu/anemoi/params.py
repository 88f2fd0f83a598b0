"""Deterministic Anemoi parameter generation.

Structure (Flystel, PHT diffusion, round shape) follows ePrint 2022/840;
``alpha`` is the smallest prime d with gcd(d, p-1) = 1 and ``g`` the
field's standard generator (``FieldSpec.generator``) — the paper's choices.

Diffusion matrices: identity at l = 1 (the PHT alone diffuses a single
pair), the paper's [[1, g], [g, g^2 + 1]] at l = 2, and a Grain-derived
Cauchy MDS (provably MDS over distinct x_i + y_j) for larger l — the
paper proposes width-specific matrices for small l that are not reachable
for cross-validation in this offline environment, and the Anemoi security
argument requires only that the diffusion be MDS.

Round-count provenance: like Griffin (griffin/params.py), the paper's
round numbers come from its algebraic (Groebner) analysis; the defaults
below are a CONSERVATIVE envelope at or above every 128-bit-security
instance the paper proposes (its counts *decrease* with l; the l = 1
column is the largest):

    l = 1 -> 25 rounds, l = 2 -> 17, l >= 3 -> 14

Deployments matching a published instance should pass ``rounds=`` (and
construct ``AnemoiConfig`` directly for published constants); every tier
is constant- and round-count-agnostic.  Defaults require log2(p) >= 60;
smaller fields must pass an explicit, externally-justified round count.

Constants provenance: the paper derives its round constants from the
digits of pi — byte-for-byte unreachable here — so, as with every
non-Poseidon family (poseidon2/params.py), the rc rows are a
*self-consistent deterministic instance* drawn from the reference's
Grain-LFSR machinery (/root/reference/src/poseidon/grain_lfsr.rs via
``poseidon.params``): rounds rows of l constants for the X column, then
rounds rows for the Y column, then the Cauchy draws for l >= 3.
"""

from __future__ import annotations

import functools

from ..fields import FieldSpec
from ..poseidon.params import _DEFAULT_CAPACITY, PoseidonGrainLFSR
from ..rescue.params import smallest_alpha
from .config import AnemoiConfig


def anemoi_default_rounds(lcol: int) -> int:
    """Conservative default round count (see module docstring provenance)."""
    if lcol == 1:
        return 25
    if lcol == 2:
        return 17
    return 14


def generate_anemoi_parameters(
    fs: FieldSpec,
    rate: int,
    capacity: int = 1,
    alpha: int | None = None,
    rounds: int | None = None,
) -> AnemoiConfig:
    """Deterministic Anemoi parameters for any even-width (field, rate,
    capacity); see module docstring for round-count and constants provenance."""
    t = rate + capacity
    if t % 2 != 0:
        raise ValueError(f"Anemoi state width must be even; got t={t}")
    lcol = t // 2
    p = fs.modulus
    g = fs.generator
    if alpha is None:
        alpha = smallest_alpha(p)
    if rounds is None:
        if fs.modulus_bit_size < 60:
            raise ValueError(
                "Anemoi's published security analysis covers large fields "
                f"only; pass rounds= explicitly for {fs.name} "
                f"({fs.modulus_bit_size} bits)"
            )
        rounds = anemoi_default_rounds(lcol)
    lfsr = PoseidonGrainLFSR(False, fs.modulus_bit_size, t, rounds, 0)
    rc_x = tuple(
        tuple(lfsr.get_field_elements_rejection_sampling(fs, lcol))
        for _ in range(rounds)
    )
    rc_y = tuple(
        tuple(lfsr.get_field_elements_rejection_sampling(fs, lcol))
        for _ in range(rounds)
    )
    if lcol == 1:
        mat_x = ((1,),)
    elif lcol == 2:
        mat_x = ((1, g), (g, (g * g + 1) % p))
    else:
        from ..monolith.params import _cauchy_mds

        mat_x = _cauchy_mds(lfsr, fs, lcol)
    return AnemoiConfig(
        field=fs,
        rounds=rounds,
        alpha=alpha,
        g=g,
        mat_x=mat_x,
        rc_x=rc_x,
        rc_y=rc_y,
        rate=rate,
        capacity=capacity,
    )


@functools.lru_cache(maxsize=None)
def get_default_anemoi_parameters(fs: FieldSpec, rate: int) -> AnemoiConfig:
    """Default Anemoi parameters: paper-smallest alpha, standard generator,
    conservative round count, per-field sponge capacity (1 for ~255-bit
    fields, 4 for Goldilocks — rate must keep t = rate + capacity even)."""
    capacity = _DEFAULT_CAPACITY.get(fs.name, 1)
    return generate_anemoi_parameters(fs, rate, capacity)
