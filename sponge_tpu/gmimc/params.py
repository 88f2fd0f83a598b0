"""Deterministic GMiMC-erf parameter generation.

Round-count provenance: the original paper's counts (ePrint 2019/397 §4)
were subsequently tightened by dedicated cryptanalysis — most notably the
"Out of Oddity" collision/distinguisher attacks on low-round GMiMC-erf
instances (ePrint 2020/188 §5) — so the defaults below use the POST-ATTACK
conservative envelope adopted by the STARK-friendly-hash evaluation
(ePrint 2020/948 instance generation):

    rounds = 2 * ceil(log_alpha(p)) + 2 * t

i.e. twice the interpolation-degree bound plus a two-per-branch Feistel
margin.  (Check: its 128-bit Feistel-MiMC-class instance at t=12 over a
61-bit field, alpha=3, uses 101 rounds; the formula gives 102.)  The paper
analyzes large fields only, so defaults require log2(p) >= 60 — smaller
fields must pass an explicit, externally-justified round count.  GMiMC
retains the weakest security margin of the shipped families; prefer
Poseidon2/Monolith/Griffin for new designs (docs/SECURITY.md).

Constants provenance: like the other additive families (griffin/params.py),
the per-round constants are a *self-consistent deterministic instance*
drawn from the reference's Grain-LFSR machinery
(/root/reference/src/poseidon/grain_lfsr.rs via ``poseidon.params``) by
rejection sampling.
"""

from __future__ import annotations

import functools
import math

from ..fields import FieldSpec
from ..poseidon.params import _DEFAULT_CAPACITY, PoseidonGrainLFSR
from ..rescue.params import smallest_alpha
from .config import GmimcConfig


def gmimc_default_rounds(fs: FieldSpec, t: int, alpha: int) -> int:
    """Conservative default round count (see module docstring provenance)."""
    return 2 * math.ceil(fs.modulus_bit_size / math.log2(alpha)) + 2 * t


def generate_gmimc_parameters(
    fs: FieldSpec,
    rate: int,
    capacity: int = 1,
    alpha: int | None = None,
    rounds: int | None = None,
) -> GmimcConfig:
    """Deterministic GMiMC-erf parameters for any supported (field, rate,
    capacity); see module docstring for round-count and constants provenance."""
    t = rate + capacity
    if alpha is None:
        alpha = smallest_alpha(fs.modulus)
    if rounds is None:
        if fs.modulus_bit_size < 60:
            raise ValueError(
                "GMiMC's post-attack security analysis covers large fields "
                f"only; pass rounds= explicitly for {fs.name} "
                f"({fs.modulus_bit_size} bits)"
            )
        rounds = gmimc_default_rounds(fs, t, alpha)
    lfsr = PoseidonGrainLFSR(False, fs.modulus_bit_size, t, rounds, 0)
    rc = tuple(lfsr.get_field_elements_rejection_sampling(fs, rounds))
    return GmimcConfig(
        field=fs, rounds=rounds, alpha=alpha, rc=rc, rate=rate,
        capacity=capacity,
    )


@functools.lru_cache(maxsize=None)
def get_default_gmimc_parameters(fs: FieldSpec, rate: int) -> GmimcConfig:
    """Default GMiMC-erf parameters: smallest valid alpha, post-attack
    conservative round count, per-field sponge capacity (same defaults as
    the other families: 1 for ~255-bit fields, 4 for Goldilocks)."""
    capacity = _DEFAULT_CAPACITY.get(fs.name, 1)
    return generate_gmimc_parameters(fs, rate, capacity)
