"""Anemoi configuration (frozen, hashable — same shape discipline as
``PoseidonConfig``, /root/reference/src/poseidon/mod.rs:24-42).

Anemoi (Bouvier-Briaud-Chaidos-Perrin-Salen-Velichkov-Willems, ePrint
2022/840) views the t = 2l state as two columns X = (x_0..x_{l-1}),
Y = (y_0..y_{l-1}) and builds its S-box from the **open Flystel** — a
3-step butterfly over each (x_j, y_j) pair mixing one inverse power map
with two quadratics in the field generator g:

    u = x - (g * y^2 + g^{-1})        # subtract Q_gamma(y)
    v = y - u^(1/alpha)               # subtract the inverse power map
    w = u + g * v^2                   # add Q_delta(v)
    (x, y) <- (w, v)

Each step is a translation by a function of the *other* wire, so the
Flystel is a permutation for ANY Q_gamma/Q_delta (inverted by replaying
the steps backwards); the specific quadratics follow the paper's
instantiation.  The round is

    constants -> diffusion M -> Flystel layer,

with one extra diffusion layer closing the permutation.  The diffusion
applies M_x to X, M_x to the rotated Y (rot-left-1 — the paper's M_y),
then the pseudo-Hadamard transform Y += X; X += Y.  M_x: identity at
l = 1 (the PHT alone diffuses), the paper's [[1, g], [g, g^2+1]] at
l = 2, and a Grain-derived Cauchy MDS for larger l (self-consistent
instance — see params.py provenance).

The reference crate ships only Poseidon; Anemoi is an additive family
behind the exact same duplex machinery (``batched_permute`` hook +
``OraclePoseidonSponge`` duplex state machine, cf. griffin/config.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from ..fields import FieldSpec


@dataclass(frozen=True)
class AnemoiConfig:
    """Parameters of the Anemoi permutation + duplex sponge geometry.

    ``rc_x``/``rc_y`` have ``rounds`` rows of ``l`` constants each (the
    per-round additions on the X / Y columns); ``mat_x`` is the l x l
    diffusion matrix (field elements as python ints); ``g`` is the
    generator the Flystel quadratics use.
    """

    field: FieldSpec
    rounds: int
    alpha: int
    g: int
    mat_x: tuple  # tuple[tuple[int, ...], ...], shape (l, l)
    rc_x: tuple  # tuple[tuple[int, ...], ...], shape (rounds, l)
    rc_y: tuple  # tuple[tuple[int, ...], ...], shape (rounds, l)
    rate: int
    capacity: int = 1

    def __post_init__(self):
        t = self.rate + self.capacity
        p = self.field.modulus
        if t < 2 or t % 2 != 0:
            raise ValueError(f"Anemoi state width must be even; got t={t}")
        lcol = t // 2
        if math.gcd(self.alpha, p - 1) != 1:
            raise ValueError(
                f"alpha={self.alpha} is not invertible mod p-1; the inverse "
                f"power map x^(1/alpha) does not exist over {self.field.name}"
            )
        if self.rounds < 1:
            raise ValueError("rounds must be >= 1")
        if self.g % p == 0:
            raise ValueError("g must be non-zero mod p")
        for name, rc in (("rc_x", self.rc_x), ("rc_y", self.rc_y)):
            if len(rc) != self.rounds:
                raise ValueError(f"{name} must have rounds rows")
            for row in rc:
                if len(row) != lcol:
                    raise ValueError(f"each {name} row must have l entries")
        if len(self.mat_x) != lcol or any(len(r) != lcol for r in self.mat_x):
            raise ValueError("mat_x must be l x l")
        if lcol == 1 and self.mat_x[0][0] % p != 1:
            # Every tier skips the 1x1 multiply at l = 1 (the PHT alone
            # diffuses a single pair, the paper's choice); a non-identity
            # matrix would silently diverge between tiers.
            raise ValueError("mat_x must be the identity at l = 1")

    @property
    def t(self) -> int:
        """State width (rate + capacity = 2l)."""
        return self.rate + self.capacity

    @property
    def l(self) -> int:
        """Column length (t / 2): the number of Flystel pairs per round."""
        return self.t // 2

    @property
    def inv_alpha(self) -> int:
        """The inverse power-map exponent: alpha^{-1} mod p-1 (~log2 p bits)."""
        return pow(self.alpha, -1, self.field.modulus - 1)

    @property
    def g_inv(self) -> int:
        """g^{-1} mod p (the Q_gamma constant term)."""
        return pow(self.g, -1, self.field.modulus)

    def batched_permute(self, state, backend: str = "auto"):
        """Permutation dispatch hook used by the shared duplex sponge
        (``poseidon.permutation.batched_permute`` delegates here for
        non-Poseidon configs)."""
        from .permutation import batched_anemoi_permute

        return batched_anemoi_permute(self, state, backend)

    def oracle_sponge(self):
        """Scalar python-int duplex sponge over this permutation (test oracle)."""
        from .oracle import OracleAnemoiSponge

        return OracleAnemoiSponge(self)
