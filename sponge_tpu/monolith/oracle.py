"""Scalar python-int Monolith permutation + duplex sponge (ground truth).

The duplex state machine (absorb/squeeze chunking, mode flips, the
no-permute squeeze edge) is IDENTICAL to Poseidon's — it lives in
``OraclePoseidonSponge`` (semantics of /root/reference/src/poseidon/mod.rs:
121-182,232-341) — so this class only overrides the permutation itself with
the Monolith round schedule (ePrint 2023/1025: Concrete, then R rounds of
Bars -> Bricks -> Concrete -> + rc, last rc row zero).
"""

from __future__ import annotations

from ..poseidon.oracle import OraclePoseidonSponge
from .config import MonolithConfig, bar_int


class OracleMonolithSponge(OraclePoseidonSponge):
    """Reference-exact duplex sponge over the Monolith permutation."""

    def __init__(self, cfg: MonolithConfig):
        super().__init__(cfg)

    def _concrete(self, state):
        mat = self.cfg.concrete
        p = self.f.p
        t = len(state)
        state[:] = [
            sum(mat[i][j] * state[j] for j in range(t)) % p for i in range(t)
        ]

    def _bricks(self, state):
        # x_i <- x_i + x_{i-1}^2 over the ORIGINAL values (parallel Feistel).
        p = self.f.p
        state[1:] = [
            (state[i] + state[i - 1] * state[i - 1]) % p
            for i in range(1, len(state))
        ]

    def permute(self):
        cfg = self.cfg
        fs = cfg.field
        state = list(self.state)

        self._concrete(state)  # opening linear layer
        for r in range(cfg.rounds):
            for i in range(cfg.bars):
                state[i] = bar_int(fs, state[i])
            self._bricks(state)
            self._concrete(state)
            rc = cfg.rc[r]  # last row all zeros (validated by the config)
            state = [(state[i] + rc[i]) % self.f.p for i in range(len(state))]
        self.state = state
