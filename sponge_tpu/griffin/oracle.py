"""Scalar python-int Griffin-pi permutation + duplex sponge (ground truth).

The duplex state machine (absorb/squeeze chunking, mode flips, the
no-permute squeeze edge) is IDENTICAL to Poseidon's — it lives in
``OraclePoseidonSponge`` (semantics of /root/reference/src/poseidon/mod.rs:
121-182,232-341) — so this class only overrides the permutation itself with
the Griffin-pi round schedule (ePrint 2022/403 §3; structure documented in
griffin/config.py).
"""

from __future__ import annotations

from ..poseidon.oracle import OraclePoseidonSponge
from .config import GriffinConfig


class OracleGriffinSponge(OraclePoseidonSponge):
    """Reference-exact duplex sponge over the Griffin-pi permutation."""

    def __init__(self, cfg: GriffinConfig):
        super().__init__(cfg)

    def _apply_mat(self, state):
        mat = self.cfg.mat_e
        p = self.f.p
        t = len(state)
        state[:] = [
            sum(mat[i][j] * state[j] for j in range(t)) % p for i in range(t)
        ]

    def _nonlinear(self, state):
        """The Griffin S layer (see griffin/config.py for the definition and
        the permutation-property argument)."""
        cfg = self.cfg
        p = self.f.p
        t = len(state)
        y0 = pow(state[0], cfg.inv_alpha, p)
        y1 = pow(state[1], cfg.alpha, p)
        new = [y0, y1]
        for i in range(2, t):
            li = ((i - 1) * y0 + y1 + (state[i - 1] if i >= 3 else 0)) % p
            a_i, b_i = cfg.quad_coeffs(i)
            quad = (li * li + a_i * li + b_i) % p
            new.append(state[i] * quad % p)
        state[:] = new

    def permute(self):
        cfg = self.cfg
        state = list(self.state)
        t = len(state)
        self._apply_mat(state)  # initial linear layer
        for r in range(cfg.rounds):
            self._nonlinear(state)
            self._apply_mat(state)
            if r < cfg.rounds - 1:
                state = [
                    self.f.add(state[i], cfg.rc[r][i]) for i in range(t)
                ]
        self.state = state
