"""Scalar python-int GMiMC-erf permutation + duplex sponge (ground truth).

The duplex state machine (absorb/squeeze chunking, mode flips, the
no-permute squeeze edge) is IDENTICAL to Poseidon's — it lives in
``OraclePoseidonSponge`` (semantics of /root/reference/src/poseidon/mod.rs:
121-182,232-341) — so this class only overrides the permutation itself with
the GMiMC-erf round schedule (ePrint 2019/397 §2.2; structure documented in
gmimc/config.py).
"""

from __future__ import annotations

from ..poseidon.oracle import OraclePoseidonSponge
from .config import GmimcConfig


class OracleGmimcSponge(OraclePoseidonSponge):
    """Reference-exact duplex sponge over the GMiMC-erf permutation."""

    def __init__(self, cfg: GmimcConfig):
        super().__init__(cfg)

    def permute(self):
        cfg = self.cfg
        p = self.f.p
        t = len(self.state)
        state = list(self.state)
        for r in range(cfg.rounds):
            f = pow((state[0] + cfg.rc[r]) % p, cfg.alpha, p)
            state = [(state[i] + f) % p for i in range(1, t)] + [state[0]]
        self.state = state
