"""Anemoi permutation family (additive: the reference ships only
Poseidon).  Same duplex sponge machinery, config-dispatched like Poseidon2."""

from .config import AnemoiConfig
from .oracle import OracleAnemoiSponge
from .params import (
    anemoi_default_rounds,
    generate_anemoi_parameters,
    get_default_anemoi_parameters,
)
from .permutation import anemoi_permute_jit, batched_anemoi_permute

__all__ = [
    "AnemoiConfig",
    "OracleAnemoiSponge",
    "anemoi_default_rounds",
    "generate_anemoi_parameters",
    "get_default_anemoi_parameters",
    "anemoi_permute_jit",
    "batched_anemoi_permute",
]
