"""GMiMC-erf configuration (frozen, hashable — same shape discipline as
``PoseidonConfig``, /root/reference/src/poseidon/mod.rs:24-42).

GMiMC (Albrecht-Grassi-Perrin-Ramacher-Rechberger-Rotaru-Roy-Schofnegger,
ePrint 2019/397) is a family of unbalanced Feistel networks over t
branches; the hashing instance is the **expanding round function** (erf)
variant: each round evaluates ONE power map on the first branch and fans
the result into every other branch, then rotates:

    F   = (x_0 + c_r)^alpha
    x_i = x_i + F                  for i = 1..t-1
    state -> (x_1, ..., x_{t-1}, x_0)

The map is a permutation for any t >= 2 and any alpha with
gcd(alpha, p-1) = 1: given the output y, x_0 = y_{t-1}, F recomputes from
x_0, and x_i = y_{i-1} - F (checked concretely in tests/test_gmimc.py).

There is no linear layer and no per-branch constant — the entire round is
one small power map plus t-1 additions, making GMiMC the cheapest-per-round
family shipped; security comes from a large round count (see params.py for
the conservative envelope and the family's attack history — GMiMC has the
weakest margin of the shipped families and is included for completeness,
not as a recommended default).

The reference crate ships only Poseidon; GMiMC is an additive family behind
the exact same duplex machinery (``batched_permute`` hook +
``OraclePoseidonSponge`` duplex state machine, cf. griffin/config.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from ..fields import FieldSpec


@dataclass(frozen=True)
class GmimcConfig:
    """Parameters of the GMiMC-erf permutation + duplex sponge geometry.

    ``rc`` has one constant per round (it enters only the F-branch input).
    """

    field: FieldSpec
    rounds: int
    alpha: int
    rc: tuple  # tuple[int, ...], length ``rounds``
    rate: int
    capacity: int = 1

    def __post_init__(self):
        t = self.rate + self.capacity
        p = self.field.modulus
        if t < 2:
            raise ValueError(f"GMiMC state width must be >= 2; got t={t}")
        if math.gcd(self.alpha, p - 1) != 1:
            raise ValueError(
                f"alpha={self.alpha} is not invertible mod p-1; the round "
                f"function is not a permutation over {self.field.name}"
            )
        if self.rounds < 1:
            raise ValueError("rounds must be >= 1")
        if len(self.rc) != self.rounds:
            raise ValueError("rc must have one constant per round")

    @property
    def t(self) -> int:
        """State width (rate + capacity)."""
        return self.rate + self.capacity

    def batched_permute(self, state, backend: str = "auto"):
        """Permutation dispatch hook used by the shared duplex sponge
        (``poseidon.permutation.batched_permute`` delegates here for
        non-Poseidon configs)."""
        from .permutation import batched_gmimc_permute

        return batched_gmimc_permute(self, state, backend)

    def oracle_sponge(self):
        """Scalar python-int duplex sponge over this permutation (test oracle)."""
        from .oracle import OracleGmimcSponge

        return OracleGmimcSponge(self)
