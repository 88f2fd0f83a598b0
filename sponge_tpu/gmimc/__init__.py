"""GMiMC-erf permutation family (additive: the reference ships only
Poseidon).  Same duplex sponge machinery, config-dispatched like Poseidon2."""

from .config import GmimcConfig
from .oracle import OracleGmimcSponge
from .params import (
    generate_gmimc_parameters,
    get_default_gmimc_parameters,
    gmimc_default_rounds,
)
from .permutation import batched_gmimc_permute, gmimc_permute_jit

__all__ = [
    "GmimcConfig",
    "OracleGmimcSponge",
    "generate_gmimc_parameters",
    "get_default_gmimc_parameters",
    "gmimc_default_rounds",
    "batched_gmimc_permute",
    "gmimc_permute_jit",
]
