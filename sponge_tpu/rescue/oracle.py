"""Scalar python-int Rescue-Prime permutation + duplex sponge (ground truth).

The duplex state machine (absorb/squeeze chunking, mode flips, the
no-permute squeeze edge) is IDENTICAL to Poseidon's — it lives in
``OraclePoseidonSponge`` (semantics of /root/reference/src/poseidon/mod.rs:
121-182,232-341) — so this class only overrides the permutation itself with
the Rescue-Prime round schedule (ePrint 2020/1143 §2.4).
"""

from __future__ import annotations

from ..poseidon.oracle import OraclePoseidonSponge
from .config import RescueConfig


class OracleRescueSponge(OraclePoseidonSponge):
    """Reference-exact duplex sponge over the Rescue-Prime permutation."""

    def __init__(self, cfg: RescueConfig):
        super().__init__(cfg)

    def _apply_mds(self, state):
        mds = self.cfg.mds
        p = self.f.p
        t = len(state)
        state[:] = [
            sum(mds[i][j] * state[j] for j in range(t)) % p for i in range(t)
        ]

    def permute(self):
        cfg = self.cfg
        f = self.f
        state = list(self.state)
        t = len(state)
        inv_alpha = cfg.inv_alpha
        for r in range(cfg.rounds):
            # forward half: S-box x^alpha, MDS, constants
            state = [f.pow(x, cfg.alpha) for x in state]
            self._apply_mds(state)
            state = [f.add(state[i], cfg.rc[2 * r][i]) for i in range(t)]
            # backward half: S-box x^(1/alpha), MDS, constants
            state = [f.pow(x, inv_alpha) for x in state]
            self._apply_mds(state)
            state = [f.add(state[i], cfg.rc[2 * r + 1][i]) for i in range(t)]
        self.state = state
