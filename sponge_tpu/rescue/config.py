"""Rescue-Prime configuration (frozen, hashable — same shape discipline as
``PoseidonConfig``, /root/reference/src/poseidon/mod.rs:24-42).

Rescue-Prime (Szepieniec-Ashur-Dhooghe, ePrint 2020/1143) alternates the
forward S-box x^alpha with the *inverse* S-box x^(1/alpha) inside every
round — the property that makes it cheap to verify in arithmetizations but
expensive to evaluate forward (the inverse exponent is ~log2(p) bits).
Round r (of N):

    state <- MDS . sbox_alpha(state)     + rc[2r]
    state <- MDS . sbox_1/alpha(state)   + rc[2r+1]

The reference crate ships only Poseidon; Rescue-Prime is an additive family
behind the exact same duplex machinery (``batched_permute`` hook +
``OraclePoseidonSponge`` duplex state machine, cf. poseidon2/config.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from ..fields import FieldSpec


@dataclass(frozen=True)
class RescueConfig:
    """Parameters of the Rescue-Prime permutation + duplex sponge geometry.

    ``rc`` is indexed ``rc[2*r + half][state_element]``: two injection rows
    per round (after the forward-S-box MDS and after the inverse-S-box MDS).
    """

    field: FieldSpec
    rounds: int
    alpha: int
    mds: tuple  # tuple[tuple[int, ...], ...], shape (t, t)
    rc: tuple  # tuple[tuple[int, ...], ...], shape (2 * rounds, t)
    rate: int
    capacity: int = 1

    def __post_init__(self):
        t = self.rate + self.capacity
        p = self.field.modulus
        if math.gcd(self.alpha, p - 1) != 1:
            raise ValueError(
                f"alpha={self.alpha} is not invertible mod p-1; the inverse "
                f"S-box x^(1/alpha) does not exist over {self.field.name}"
            )
        if self.rounds < 1:
            raise ValueError("rounds must be >= 1")
        if len(self.rc) != 2 * self.rounds:
            raise ValueError("rc must have 2 * rounds rows")
        for row in self.rc:
            if len(row) != t:
                raise ValueError("each rc row must have t entries")
        if len(self.mds) != t or any(len(row) != t for row in self.mds):
            raise ValueError("mds must be t x t")

    @property
    def t(self) -> int:
        """State width (rate + capacity)."""
        return self.rate + self.capacity

    @property
    def inv_alpha(self) -> int:
        """The inverse S-box exponent: alpha^{-1} mod p-1 (~log2 p bits)."""
        return pow(self.alpha, -1, self.field.modulus - 1)

    def batched_permute(self, state, backend: str = "auto"):
        """Permutation dispatch hook used by the shared duplex sponge
        (``poseidon.permutation.batched_permute`` delegates here for
        non-Poseidon configs)."""
        from .permutation import batched_rescue_permute

        return batched_rescue_permute(self, state, backend)

    def oracle_sponge(self):
        """Scalar python-int duplex sponge over this permutation (test oracle)."""
        from .oracle import OracleRescueSponge

        return OracleRescueSponge(self)
