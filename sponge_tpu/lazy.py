"""Dispatch-batched interactive sponge: the full ``PoseidonSponge`` surface with
absorbs queued host-side and flushed as ONE fused jitted segment per squeeze.

The plain interactive sponge issues several small device dispatches per step
(rate-row add, permutation, slice, from_mont), which through a remote-tunneled
TPU costs ~44x the compiled-transcript path.  A transcript's *structure* is
usually loop-shaped — Fiat–Shamir protocols absorb/squeeze the same step shapes
every round — so this subclass:

* queues ``absorb`` element planes host-side (no device work at all),
* on any squeeze, compiles the pending ``[Absorb(k1)..Absorb(km),
  SqueezeNative(n)]`` segment starting from the current duplex bookkeeping into
  one jitted program (``transcript._replay`` from a live state), and
* caches segments by (config, start mode/index, step shapes, backend) — a loop
  with stable per-iteration structure compiles once and then costs a single
  dispatch per iteration.

Bit-exactness: segments replay the exact reference duplex machine
(/root/reference/src/poseidon/mod.rs:121-182, 232-341) and are tested against
the interactive sponge and the scalar oracle on interleaved schedules.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .poseidon.config import PoseidonConfig
from .poseidon.oracle import SpongeState
from .sponge import PoseidonSponge
from .transcript import Absorb, SqueezeNative, _replay, segment_bookkeeping


@functools.lru_cache(maxsize=None)
def _segment_fn(
    cfg: PoseidonConfig,
    steps: Tuple,
    start_mode: str,
    start_index: int,
    backend: str,
):
    """Jitted ``(state, elems) -> (squeezed_canonical, new_state)`` for one
    segment, plus the host-static final (mode, index)."""

    @jax.jit
    def run(state, elems):
        return _replay(
            cfg,
            steps,
            elems,
            backend,
            state=state,
            mode=start_mode,
            index=start_index,
            return_state=True,
        )

    end_mode, end_index = segment_bookkeeping(cfg, steps, start_mode, start_index)
    return run, end_mode, end_index


class LazyPoseidonSponge(PoseidonSponge):
    """``PoseidonSponge`` with segment-batched dispatch (see module docstring).

    Drop-in: same constructor, same absorb/squeeze/fork/state surface, same
    outputs bit-for-bit; only the device dispatch pattern differs.
    """

    def __init__(self, cfg: PoseidonConfig, batch_size: int = 1, backend: str = "auto"):
        super().__init__(cfg, batch_size)
        self._backend = backend
        self._pending: list = []  # queued (k, L, Bp) element planes

    # -- queuing --------------------------------------------------------------

    def absorb_element_plane(self, elems):
        if elems.shape[0] == 0:
            return
        if elems.shape[-1] != self._padded:
            if elems.shape[-1] != self.batch_size:
                raise ValueError("element plane batch axis must match batch_size")
            pad = self._padded - elems.shape[-1]
            elems = np.pad(np.asarray(elems), [(0, 0), (0, 0), (0, pad)])
        self._pending.append(np.asarray(elems))

    # -- flushing -------------------------------------------------------------

    def _flush(self, squeeze_n: int = 0):
        """Run all queued absorbs (plus an optional squeeze) as one program.

        Returns the squeezed canonical (squeeze_n, L, Bp) plane, or None when
        ``squeeze_n == 0``.
        """
        steps = tuple(Absorb(p.shape[0]) for p in self._pending)
        if squeeze_n:
            steps = steps + (SqueezeNative(squeeze_n),)
        if not steps:
            return None
        fn, end_mode, end_index = _segment_fn(
            self.cfg, steps, self.mode, self.index, self._backend
        )
        L = self.cfg.field.nlimbs
        elems = (
            np.concatenate(self._pending, axis=0)
            if self._pending
            else np.zeros((0, L, self._padded), dtype=np.int32)
        )
        self._pending = []
        out, self.plane = fn(self.plane, jnp.asarray(elems))
        self.mode, self.index = end_mode, end_index
        return out if squeeze_n else None

    def squeeze_native_plane(self, num: int) -> jnp.ndarray:
        out = self._flush(num)
        return out[..., : self.batch_size]

    # -- fork / clone / SpongeExt ---------------------------------------------

    def clone(self) -> "LazyPoseidonSponge":
        new = LazyPoseidonSponge.__new__(LazyPoseidonSponge)
        new.cfg = self.cfg
        new.batch_size = self.batch_size
        new._padded = self._padded
        new.plane = self.plane
        new.mode = self.mode
        new.index = self.index
        new._backend = self._backend
        new._pending = list(self._pending)  # planes are immutable, share them
        return new

    def into_state(self) -> SpongeState:
        self._flush(0)
        return super().into_state()

    @classmethod
    def from_state(
        cls, state: SpongeState, cfg: PoseidonConfig, batch_size: Optional[int] = None
    ) -> "LazyPoseidonSponge":
        new = super().from_state(state, cfg, batch_size)
        new._backend = "auto"
        new._pending = []
        return new
