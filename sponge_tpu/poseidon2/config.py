"""Poseidon2 configuration (frozen, hashable — same shape discipline as
``PoseidonConfig``, /root/reference/src/poseidon/mod.rs:24-42).

The round schedule is the ePrint 2023/323 one:

    state <- M_E . state                                   (initial linear layer)
    R_F/2 external rounds:  state <- M_E . sbox(state + rc_ext[r])
    R_P   internal rounds:  state[0] <- sbox(state[0] + rc_int[r]); state <- M_I . state
    R_F/2 external rounds:  state <- M_E . sbox(state + rc_ext[r])

``mat_e`` is stored dense (t x t small ints); ``mat_i_diag`` stores the
diagonal ``mu`` of ``M_I = J + diag(mu - 1)`` (off-diagonal entries are all 1).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..fields import FieldSpec


@dataclass(frozen=True)
class Poseidon2Config:
    """Parameters of the Poseidon2 permutation + duplex sponge geometry.

    ``external_rc`` is indexed ``external_rc[round][state_element]`` over the
    R_F external rounds (first half applied before the internal phase, second
    half after); ``internal_rc[r]`` is the single element-0 constant of
    internal round r.
    """

    field: FieldSpec
    full_rounds: int
    partial_rounds: int
    alpha: int
    external_rc: tuple  # tuple[tuple[int, ...], ...], shape (R_F, t)
    internal_rc: tuple  # tuple[int, ...], shape (R_P,)
    mat_e: tuple  # tuple[tuple[int, ...], ...], shape (t, t), small ints
    mat_i_diag: tuple  # tuple[int, ...], shape (t,) — diagonal mu of M_I
    rate: int
    capacity: int = 1

    def __post_init__(self):
        t = self.rate + self.capacity
        if self.full_rounds % 2 != 0:
            raise ValueError("full_rounds must be even (R_F/2 + R_P + R_F/2)")
        if len(self.external_rc) != self.full_rounds:
            raise ValueError("external_rc must have full_rounds rows")
        for row in self.external_rc:
            if len(row) != t:
                raise ValueError("each external_rc row must have t entries")
        if len(self.internal_rc) != self.partial_rounds:
            raise ValueError("internal_rc must have partial_rounds entries")
        if len(self.mat_e) != t or any(len(row) != t for row in self.mat_e):
            raise ValueError("mat_e must be t x t")
        if len(self.mat_i_diag) != t:
            raise ValueError("mat_i_diag must have t entries")

    @property
    def t(self) -> int:
        """State width (rate + capacity)."""
        return self.rate + self.capacity

    @property
    def rounds(self) -> int:
        return self.full_rounds + self.partial_rounds

    def batched_permute(self, state, backend: str = "auto"):
        """Permutation dispatch hook used by the shared duplex sponge
        (``poseidon.permutation.batched_permute`` delegates here for
        non-Poseidon configs)."""
        from .permutation import batched_permute2

        return batched_permute2(self, state, backend)

    def oracle_sponge(self):
        """Scalar python-int duplex sponge over this permutation (test oracle)."""
        from .oracle import OraclePoseidon2Sponge

        return OraclePoseidon2Sponge(self)
