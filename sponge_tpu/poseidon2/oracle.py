"""Scalar python-int Poseidon2 permutation + duplex sponge (ground truth).

The duplex state machine (absorb/squeeze chunking, mode flips, the
no-permute squeeze edge) is IDENTICAL to Poseidon's — it lives in
``OraclePoseidonSponge`` (semantics of /root/reference/src/poseidon/mod.rs:
121-182,232-341) — so this class only overrides the permutation itself with
the ePrint 2023/323 round schedule.
"""

from __future__ import annotations

from ..poseidon.oracle import OraclePoseidonSponge
from .config import Poseidon2Config


class OraclePoseidon2Sponge(OraclePoseidonSponge):
    """Reference-exact duplex sponge over the Poseidon2 permutation."""

    def __init__(self, cfg: Poseidon2Config):
        super().__init__(cfg)

    # ---- linear layers ----

    def _apply_external_matrix(self, state):
        mat = self.cfg.mat_e
        p = self.f.p
        t = len(state)
        new = []
        for i in range(t):
            acc = 0
            for j in range(t):
                acc += mat[i][j] * state[j]
            new.append(acc % p)
        state[:] = new

    def _apply_internal_matrix(self, state):
        # M_I = J + diag(mu - 1):  out_i = sum_j x_j + (mu_i - 1) * x_i.
        p = self.f.p
        diag = self.cfg.mat_i_diag
        sigma = sum(state) % p
        state[:] = [
            (sigma + (diag[i] - 1) * state[i]) % p for i in range(len(state))
        ]

    # ---- permutation (ePrint 2023/323 round schedule) ----

    def permute(self):
        cfg = self.cfg
        state = list(self.state)
        alpha = cfg.alpha
        half = cfg.full_rounds // 2

        self._apply_external_matrix(state)  # initial linear layer

        for r in range(half):
            for i in range(len(state)):
                state[i] = self.f.pow(
                    self.f.add(state[i], cfg.external_rc[r][i]), alpha
                )
            self._apply_external_matrix(state)

        for r in range(cfg.partial_rounds):
            state[0] = self.f.pow(
                self.f.add(state[0], cfg.internal_rc[r]), alpha
            )
            self._apply_internal_matrix(state)

        for r in range(half, cfg.full_rounds):
            for i in range(len(state)):
                state[i] = self.f.pow(
                    self.f.add(state[i], cfg.external_rc[r][i]), alpha
                )
            self._apply_external_matrix(state)

        self.state = state
