"""Scalar python-int Poseidon duplex sponge — the bit-exactness oracle.

A deliberately direct transcription of the reference semantics
(/root/reference/src/poseidon/mod.rs) over arbitrary-precision ints.  It is slow,
obviously correct, and is what every batched/JAX/Pallas tier is tested against.
It is NOT on any hot path.

Parity quirks intentionally preserved (SURVEY.md §2.1/§3.2):
  * absorb *adds* into the rate region of the ``capacity ‖ rate`` state
    (mod.rs:128,143);
  * the squeeze loop skips the permutation when the remaining output length equals
    the rate (mod.rs:174-177) — even when ``rate_start_index > 0``, in which case
    already-emitted state is re-read;  do not "fix" this.
"""

from __future__ import annotations

from ..ops.montgomery import OracleField
from .config import PoseidonConfig

ABSORBING = "absorbing"
SQUEEZING = "squeezing"


class OraclePoseidonSponge:
    """Reference-exact duplex sponge over python ints (state layout capacity‖rate)."""

    def __init__(self, cfg: PoseidonConfig):
        self.cfg = cfg
        self.f = OracleField(cfg.field)
        self.state = [0] * cfg.t  # zero-init, mod.rs:220
        self.mode = ABSORBING
        self.index = 0  # next absorb/squeeze index within the rate

    # ---- permutation (mod.rs:95-118) ----

    def _apply_sbox(self, state, is_full_round: bool):
        alpha = self.cfg.alpha
        if is_full_round:
            for i in range(len(state)):
                state[i] = self.f.pow(state[i], alpha)
        else:
            state[0] = self.f.pow(state[0], alpha)

    def _apply_ark(self, state, round_number: int):
        for i in range(len(state)):
            state[i] = self.f.add(state[i], self.cfg.ark[round_number][i])

    def _apply_mds(self, state):
        mds = self.cfg.mds
        new_state = []
        for i in range(len(state)):
            cur = 0
            for j in range(len(state)):
                cur = self.f.add(cur, self.f.mul(state[j], mds[i][j]))
            new_state.append(cur)
        state[:] = new_state

    def permute(self):
        half_full = self.cfg.full_rounds // 2
        state = list(self.state)
        for r in range(half_full):
            self._apply_ark(state, r)
            self._apply_sbox(state, True)
            self._apply_mds(state)
        for r in range(half_full, half_full + self.cfg.partial_rounds):
            self._apply_ark(state, r)
            self._apply_sbox(state, False)
            self._apply_mds(state)
        for r in range(half_full + self.cfg.partial_rounds, self.cfg.rounds):
            self._apply_ark(state, r)
            self._apply_sbox(state, True)
            self._apply_mds(state)
        self.state = state

    # ---- duplex state machine (mod.rs:121-182, 232-341) ----

    def _absorb_internal(self, rate_start_index: int, elements):
        cfg = self.cfg
        remaining = list(elements)
        while True:
            if rate_start_index + len(remaining) <= cfg.rate:
                for i, elem in enumerate(remaining):
                    idx = cfg.capacity + i + rate_start_index
                    self.state[idx] = self.f.add(self.state[idx], elem)
                self.mode = ABSORBING
                self.index = rate_start_index + len(remaining)
                return
            num_absorbed = cfg.rate - rate_start_index
            for i in range(num_absorbed):
                idx = cfg.capacity + i + rate_start_index
                self.state[idx] = self.f.add(self.state[idx], remaining[i])
            self.permute()
            remaining = remaining[num_absorbed:]
            rate_start_index = 0

    def _squeeze_internal(self, rate_start_index: int, num: int):
        cfg = self.cfg
        out = []
        remaining = num
        while True:
            if rate_start_index + remaining <= cfg.rate:
                s = cfg.capacity + rate_start_index
                out.extend(self.state[s : s + remaining])
                self.mode = SQUEEZING
                self.index = rate_start_index + remaining
                return out
            num_squeezed = cfg.rate - rate_start_index
            s = cfg.capacity + rate_start_index
            out.extend(self.state[s : s + num_squeezed])
            # Parity quirk: no permute when the remaining output exactly equals the
            # rate (mod.rs:174-177).
            if remaining != cfg.rate:
                self.permute()
            remaining -= num_squeezed
            rate_start_index = 0

    def absorb_field_elements(self, elems):
        """Absorb pre-encoded native field elements (mod.rs:232-254)."""
        elems = [e % self.cfg.field.modulus for e in elems]
        if not elems:
            return
        if self.mode == ABSORBING:
            absorb_index = self.index
            if absorb_index == self.cfg.rate:
                self.permute()
                absorb_index = 0
            self._absorb_internal(absorb_index, elems)
        else:
            self.permute()
            self._absorb_internal(0, elems)

    def squeeze_native_field_elements(self, num: int):
        """mod.rs:321-341."""
        if self.mode == ABSORBING:
            self.permute()
            return self._squeeze_internal(0, num)
        squeeze_index = self.index
        if squeeze_index == self.cfg.rate:
            self.permute()
            squeeze_index = 0
        return self._squeeze_internal(squeeze_index, num)
