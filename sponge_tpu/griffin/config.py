"""Griffin-pi configuration (frozen, hashable — same shape discipline as
``PoseidonConfig``, /root/reference/src/poseidon/mod.rs:24-42).

Griffin (Grassi-Hao-Luftenegger-Oygarden-Rechberger-Schofnegger-Walch,
ePrint 2022/403) is a Horst/SPN hybrid whose nonlinear layer mixes one
inverse power map, one forward power map, and t-2 *multiplicative* elements
gated by a quadratic of a linear combination:

    y_0 = x_0^(1/d)
    y_1 = x_1^d
    y_i = x_i * (L_i^2 + alpha_i * L_i + beta_i)        for i = 2..t-1
          with L_i = (i-1) * y_0 + y_1 + x_{i-1}        (x_1 term: i = 2
          uses L_2 = y_0 + y_1, no state feed-in)

where (alpha_i, beta_i) = ((i-1) * a, (i-1)^2 * b) for a base pair (a, b)
with a^2 - 4b a quadratic NON-residue mod p — this makes z^2 + alpha_i*z +
beta_i root-free for every i (discriminant (i-1)^2 * (a^2 - 4b) stays a
non-residue), so each y_i is x_i times a non-zero factor and the layer is a
permutation (inverted sequentially: x_0 = y_0^d, x_1 = y_1^(1/d), then
x_i = y_i / quad(L_i) in index order, each L_i computable from
already-recovered values).

The linear layer is the SAME small-integer matrix family Poseidon2 uses
(circ(2,1,1) at t=3, M4 at t=4, the block-circulant 2*M4/M4 structure at
t = 4k — ``poseidon2.params.external_matrix``), so it shares that tier's
REDC-free plain-integer scaling on limb planes.

The reference crate ships only Poseidon; Griffin is an additive family
behind the exact same duplex machinery (``batched_permute`` hook +
``OraclePoseidonSponge`` duplex state machine, cf. rescue/config.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from ..fields import FieldSpec


def is_quadratic_nonresidue(v: int, p: int) -> bool:
    """Euler criterion: v^((p-1)/2) == -1 mod p (p an odd prime)."""
    return v % p != 0 and pow(v % p, (p - 1) // 2, p) == p - 1


@dataclass(frozen=True)
class GriffinConfig:
    """Parameters of the Griffin-pi permutation + duplex sponge geometry.

    ``rc`` has ``rounds - 1`` rows (the last round adds no constants, ePrint
    2022/403 §3: c_{R-1} = 0); ``qc_alpha``/``qc_beta`` are the base (a, b)
    of the per-element quadratics (see module docstring).
    """

    field: FieldSpec
    rounds: int
    alpha: int
    mat_e: tuple  # tuple[tuple[int, ...], ...], shape (t, t), small plain ints
    rc: tuple  # tuple[tuple[int, ...], ...], shape (rounds - 1, t)
    qc_alpha: int
    qc_beta: int
    rate: int
    capacity: int = 1

    def __post_init__(self):
        t = self.rate + self.capacity
        p = self.field.modulus
        if t < 3 or (t != 3 and t % 4 != 0):
            raise ValueError(
                f"Griffin state width must be 3 or a multiple of 4; got t={t}"
            )
        if math.gcd(self.alpha, p - 1) != 1:
            raise ValueError(
                f"alpha={self.alpha} is not invertible mod p-1; the inverse "
                f"power map x^(1/alpha) does not exist over {self.field.name}"
            )
        if self.rounds < 1:
            raise ValueError("rounds must be >= 1")
        if len(self.rc) != self.rounds - 1:
            raise ValueError("rc must have rounds - 1 rows")
        for row in self.rc:
            if len(row) != t:
                raise ValueError("each rc row must have t entries")
        if len(self.mat_e) != t or any(len(row) != t for row in self.mat_e):
            raise ValueError("mat_e must be t x t")
        disc = (self.qc_alpha * self.qc_alpha - 4 * self.qc_beta) % p
        if not is_quadratic_nonresidue(disc, p):
            raise ValueError(
                "qc_alpha^2 - 4*qc_beta must be a quadratic non-residue mod p "
                "(otherwise some quadratic factor has a root and the "
                "nonlinear layer is not a permutation)"
            )

    @property
    def t(self) -> int:
        """State width (rate + capacity)."""
        return self.rate + self.capacity

    @property
    def inv_alpha(self) -> int:
        """The inverse power-map exponent: alpha^{-1} mod p-1 (~log2 p bits)."""
        return pow(self.alpha, -1, self.field.modulus - 1)

    def quad_coeffs(self, i: int) -> tuple[int, int]:
        """(alpha_i, beta_i) of the i-th element's quadratic, i in 2..t-1."""
        p = self.field.modulus
        g = i - 1
        return (g * self.qc_alpha) % p, (g * g * self.qc_beta) % p

    def batched_permute(self, state, backend: str = "auto"):
        """Permutation dispatch hook used by the shared duplex sponge
        (``poseidon.permutation.batched_permute`` delegates here for
        non-Poseidon configs)."""
        from .permutation import batched_griffin_permute

        return batched_griffin_permute(self, state, backend)

    def oracle_sponge(self):
        """Scalar python-int duplex sponge over this permutation (test oracle)."""
        from .oracle import OracleGriffinSponge

        return OracleGriffinSponge(self)
