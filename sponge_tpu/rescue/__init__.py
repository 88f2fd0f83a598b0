"""Rescue-Prime permutation family (additive: the reference ships only
Poseidon).  Same duplex sponge machinery, config-dispatched like Poseidon2."""

from .config import RescueConfig
from .oracle import OracleRescueSponge
from .params import (
    generate_rescue_parameters,
    get_default_rescue_parameters,
    rescue_round_count,
    smallest_alpha,
)
from .permutation import batched_rescue_permute, rescue_permute_jit

__all__ = [
    "RescueConfig",
    "OracleRescueSponge",
    "generate_rescue_parameters",
    "get_default_rescue_parameters",
    "rescue_round_count",
    "smallest_alpha",
    "batched_rescue_permute",
    "rescue_permute_jit",
]
