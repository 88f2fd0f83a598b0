"""sponge_tpu: a TPU-native cryptographic (duplex) sponge framework.

A from-scratch JAX/Pallas rebuild of the capabilities of `arkworks-rs/sponge`
(`ark-sponge`): the `CryptographicSponge` duplex API, the Poseidon permutation,
Grain-LFSR parameter generation, the Absorb input codec, sponge state
save/restore, and a constraint-tracing mirror — re-architected around batched
limb-plane field arithmetic, `jax.sharding` data parallelism, and fused Pallas
permutation kernels.
"""

from .fields import BLS12_381_FR, BN254_FR, FieldSpec, get_field
from .poseidon.config import PoseidonConfig
from .poseidon.params import find_poseidon_ark_and_mds, get_default_poseidon_parameters

__all__ = [
    "BLS12_381_FR",
    "BN254_FR",
    "FieldSpec",
    "get_field",
    "PoseidonConfig",
    "find_poseidon_ark_and_mds",
    "get_default_poseidon_parameters",
]

__version__ = "0.1.0"
