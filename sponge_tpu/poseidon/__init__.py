"""Poseidon permutation, parameters, and duplex sponge state machine."""

from .config import PoseidonConfig, device_constants
from .oracle import OraclePoseidonSponge
from .params import (
    PoseidonGrainLFSR,
    find_poseidon_ark_and_mds,
    get_default_poseidon_parameters,
    register_default_table,
)
from .permutation import permute, permute_jit, zero_state

__all__ = [
    "PoseidonConfig",
    "device_constants",
    "OraclePoseidonSponge",
    "PoseidonGrainLFSR",
    "find_poseidon_ark_and_mds",
    "get_default_poseidon_parameters",
    "register_default_table",
    "permute",
    "permute_jit",
    "zero_state",
]
