"""Griffin-pi permutation family (additive: the reference ships only
Poseidon).  Same duplex sponge machinery, config-dispatched like Poseidon2."""

from .config import GriffinConfig, is_quadratic_nonresidue
from .oracle import OracleGriffinSponge
from .params import (
    generate_griffin_parameters,
    get_default_griffin_parameters,
    griffin_default_rounds,
)
from .permutation import batched_griffin_permute, griffin_permute_jit

__all__ = [
    "GriffinConfig",
    "OracleGriffinSponge",
    "is_quadratic_nonresidue",
    "generate_griffin_parameters",
    "get_default_griffin_parameters",
    "griffin_default_rounds",
    "batched_griffin_permute",
    "griffin_permute_jit",
]
