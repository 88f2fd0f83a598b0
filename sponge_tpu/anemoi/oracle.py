"""Scalar python-int Anemoi permutation + duplex sponge (ground truth).

The duplex state machine (absorb/squeeze chunking, mode flips, the
no-permute squeeze edge) is IDENTICAL to Poseidon's — it lives in
``OraclePoseidonSponge`` (semantics of /root/reference/src/poseidon/mod.rs:
121-182,232-341) — so this class only overrides the permutation itself with
the Anemoi round schedule (ePrint 2022/840 structure; documented in
anemoi/config.py).
"""

from __future__ import annotations

from ..poseidon.oracle import OraclePoseidonSponge
from .config import AnemoiConfig


class OracleAnemoiSponge(OraclePoseidonSponge):
    """Reference-exact duplex sponge over the Anemoi permutation."""

    def __init__(self, cfg: AnemoiConfig):
        super().__init__(cfg)

    def _diffusion(self, xs, ys):
        """M_x on X, M_x on rot-left-1(Y), then the PHT (config docstring)."""
        cfg = self.cfg
        p = self.f.p
        lcol = cfg.l
        m = cfg.mat_x
        yr = ys[1:] + ys[:1]  # rotate left by 1 (identity at l = 1)
        xs2 = [
            sum(m[i][j] * xs[j] for j in range(lcol)) % p for i in range(lcol)
        ]
        ys2 = [
            sum(m[i][j] * yr[j] for j in range(lcol)) % p for i in range(lcol)
        ]
        ys3 = [(ys2[i] + xs2[i]) % p for i in range(lcol)]
        xs3 = [(xs2[i] + ys3[i]) % p for i in range(lcol)]
        return xs3, ys3

    def _flystel(self, x, y):
        """The open Flystel H(x, y) (see anemoi/config.py)."""
        p = self.f.p
        cfg = self.cfg
        u = (x - (cfg.g * y * y + cfg.g_inv)) % p
        v = (y - pow(u, cfg.inv_alpha, p)) % p
        w = (u + cfg.g * v * v) % p
        return w, v

    def permute(self):
        cfg = self.cfg
        p = self.f.p
        lcol = cfg.l
        xs = list(self.state[:lcol])
        ys = list(self.state[lcol:])
        for r in range(cfg.rounds):
            xs = [(xs[j] + cfg.rc_x[r][j]) % p for j in range(lcol)]
            ys = [(ys[j] + cfg.rc_y[r][j]) % p for j in range(lcol)]
            xs, ys = self._diffusion(xs, ys)
            for j in range(lcol):
                xs[j], ys[j] = self._flystel(xs[j], ys[j])
        xs, ys = self._diffusion(xs, ys)  # closing linear layer
        self.state = xs + ys
