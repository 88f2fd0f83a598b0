"""Poseidon configuration.

Mirrors the reference ``PoseidonConfig`` struct and its validated constructor
(/root/reference/src/poseidon/mod.rs:24-42, 186-214), re-expressed as a frozen,
hashable dataclass whose round constants are plain python ints (host side).  Device
form (Montgomery limb planes) is materialized lazily per field via
``device_constants``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..fields import FieldSpec


@dataclass(frozen=True)
class PoseidonConfig:
    """Parameters of the Poseidon permutation + duplex sponge geometry.

    ``ark`` is indexed ``ark[round][state_element]`` and added *before* each MDS
    application; ``mds`` is the (t x t) MDS matrix; ``rate``/``capacity`` define the
    duplex split with state layout ``capacity ‖ rate``
    (cf. /root/reference/src/poseidon/mod.rs:24-42,128).
    """

    field: FieldSpec
    full_rounds: int
    partial_rounds: int
    alpha: int
    ark: tuple  # tuple[tuple[int, ...], ...], shape (R, t)
    mds: tuple  # tuple[tuple[int, ...], ...], shape (t, t)
    rate: int
    capacity: int = 1

    def __post_init__(self):
        # Shape validation, mirroring PoseidonConfig::new asserts
        # (/root/reference/src/poseidon/mod.rs:196-202).
        t = self.rate + self.capacity
        if len(self.ark) != self.full_rounds + self.partial_rounds:
            raise ValueError("ark must have full_rounds + partial_rounds rows")
        for row in self.ark:
            if len(row) != t:
                raise ValueError("each ark row must have rate + capacity entries")
        if len(self.mds) != t:
            raise ValueError("mds must have rate + capacity rows")
        for row in self.mds:
            if len(row) != t:
                raise ValueError("each mds row must have rate + capacity entries")

    @property
    def t(self) -> int:
        """State width (rate + capacity)."""
        return self.rate + self.capacity

    @property
    def rounds(self) -> int:
        return self.full_rounds + self.partial_rounds

    def oracle_sponge(self):
        """Scalar python-int duplex sponge over this permutation (test
        oracle) — the same hook every additive family config exposes."""
        from .oracle import OraclePoseidonSponge

        return OraclePoseidonSponge(self)


@functools.lru_cache(maxsize=None)
def device_constants(cfg: PoseidonConfig):
    """Round constants in device layout (numpy, Montgomery limb planes).

    Returns dict with:
      * ``ark``:  (R, t, L, 1) int32 — Montgomery form (they are *added* to
        Montgomery-form state, so must live in the same domain),
      * ``mds``:  (t, t, L, 1) int32 — Montgomery form (multiplied via mont_mul).
    Trailing singleton axis broadcasts over the batch lane axis.
    """
    fs = cfg.field
    ark = np.stack(
        [np.stack([fs.int_to_mont_limbs(c) for c in row], axis=0) for row in cfg.ark],
        axis=0,
    ).astype(np.int32)[..., None]
    mds = np.stack(
        [np.stack([fs.int_to_mont_limbs(c) for c in row], axis=0) for row in cfg.mds],
        axis=0,
    ).astype(np.int32)[..., None]
    return {"ark": ark, "mds": mds}
