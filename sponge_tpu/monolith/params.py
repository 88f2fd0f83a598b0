"""Deterministic Monolith parameter generation.

Structure follows ePrint 2023/1025: R = 6 rounds, Bars on the leading u
elements (u = 4 for the 64-bit instance, u = 8 for 31-bit ones), Bricks,
and an MDS Concrete layer, with round constants added after Concrete in all
but the last round.

Concrete matrices (all three defaults take the multiplication-free scaled
device path — small plain-integer entries, no REDC in the linear layer):

* Goldilocks t = 12 uses a power-of-two circulant
  (circ(1, 1, 2, 1, 8, 32, 2, 256, 4096, 8, 65536, 1024) — the plonky2-
  family t = 12 matrix shape), verified MDS by exhaustive minor check in
  ``tools/check_mds.py`` (225K rotation-unique minors).
* 31-bit fields (Mersenne31, KoalaBear, BabyBear) use a small-integer
  circulant (entries <= 31) found by the deterministic search in
  ``tools/check_mds.cc`` (xorshift64 seed 20230825, candidate 11) and
  verified MDS over ALL THREE fields by the same exhaustive minor check
  (37.6M rotation-unique minors each).  Power-of-two circulants were ruled
  out over Mersenne31: ord(2) = 31 there, so 2x2 circulant minors
  2^(e_a+e_b) - 2^(e_c+e_d) vanish whenever exponent sums collide mod 31 —
  every random draw failed; small-integer products < p collide only as
  integers, which the search avoids within a dozen candidates.

Non-default fields fall back to the Cauchy construction
``mds[i][j] = (x_i + y_j)^{-1}`` (provably MDS for distinct draws), drawn
from the same Grain stream as the round constants.

Round constants are drawn from the Grain LFSR construction the original
Poseidon parameters use (/root/reference/src/poseidon/grain_lfsr.rs, reused
via ``poseidon.params.PoseidonGrainLFSR``), seeded with
(sbox_inverse=False, prime_bits, t, R_F=rounds, R_P=bars) — rounds-1 rows of
t rejection-sampled elements (the last row is structurally zero), then the
Cauchy draws where applicable.

NOTE: the reference crate has no Monolith, and no official
cross-implementation vectors are reachable in this offline environment, so
these defaults are a *self-consistent deterministic instance* of the
Monolith structure (same convention as the Poseidon2 / Rescue-Prime
families here) — the scalar oracle (``monolith.oracle``) is the ground truth
the device tiers are tested against.  Deployments matching a published
instance should construct ``MonolithConfig`` directly from those constants;
every downstream component is constant-agnostic.
"""

from __future__ import annotations

import functools

from ..fields import FieldSpec
from ..poseidon.params import PoseidonGrainLFSR
from .config import MonolithConfig

# Power-of-two circulant first row for the 64-bit t=12 instance; MDS over
# Goldilocks verified exhaustively by tools/check_mds.py (225K unique minors).
_GOLDILOCKS_T12_ROW = (1, 1, 2, 1, 8, 32, 2, 256, 4096, 8, 65536, 1024)

# Small-integer circulant first row for the 31-bit t=16 instances; MDS over
# Mersenne31, KoalaBear AND BabyBear, each verified exhaustively by
# tools/check_mds.cc (37.6M rotation-unique minors per field; deterministic
# search seed 20230825).
_M31_T16_ROW = (31, 19, 21, 11, 5, 7, 9, 26, 9, 16, 23, 13, 30, 30, 17, 5)

# Small-integer circulant for the 64-bit t=8 instance (the paper's other
# Monolith-64 geometry); MDS over Goldilocks verified by tools/check_mds.cc
# (1619 rotation-unique minors; same deterministic search, seed 20230825).
_GOLDILOCKS_T8_ROW = (25, 6, 2, 25, 27, 14, 29, 1)


def _circulant(row: tuple) -> tuple:
    t = len(row)
    return tuple(tuple(row[(j - i) % t] for j in range(t)) for i in range(t))


def _cauchy_mds(lfsr: PoseidonGrainLFSR, fs: FieldSpec, t: int) -> tuple:
    """Provably-MDS Cauchy matrix from the Grain stream: redraw until the
    x_i are pairwise distinct, the y_j are pairwise distinct, and every
    x_i + y_j is nonzero (the three Cauchy-MDS preconditions)."""
    p = fs.modulus
    while True:
        xs = lfsr.get_field_elements_mod_p(fs, t)
        ys = lfsr.get_field_elements_mod_p(fs, t)
        if len(set(xs)) != t or len(set(ys)) != t:
            continue
        if any((x + y) % p == 0 for x in xs for y in ys):
            continue
        return tuple(tuple(pow((x + y) % p, -1, p) for y in ys) for x in xs)


def generate_monolith_parameters(
    fs: FieldSpec,
    rate: int,
    capacity: int,
    rounds: int = 6,
    bars: int | None = None,
    concrete: tuple | None = None,
) -> MonolithConfig:
    """Deterministic Monolith parameters for a bar-safe field."""
    t = rate + capacity
    if bars is None:
        bars = 4 if fs.modulus_bit_size > 32 else 8
    lfsr = PoseidonGrainLFSR(False, fs.modulus_bit_size, t, rounds, bars)
    rc = tuple(
        tuple(lfsr.get_field_elements_rejection_sampling(fs, t))
        for _ in range(rounds - 1)
    ) + ((0,) * t,)
    if concrete is None:
        if fs.name == "goldilocks_fr" and t == 12:
            concrete = _circulant(_GOLDILOCKS_T12_ROW)
        elif fs.name == "goldilocks_fr" and t == 8:
            concrete = _circulant(_GOLDILOCKS_T8_ROW)
        elif fs.name in ("mersenne31_fr", "koalabear_fr", "babybear_fr") and t == 16:
            concrete = _circulant(_M31_T16_ROW)
        else:
            concrete = _cauchy_mds(lfsr, fs, t)
    return MonolithConfig(
        field=fs,
        rounds=rounds,
        bars=bars,
        rc=rc,
        concrete=concrete,
        rate=rate,
        capacity=capacity,
    )


# (field, rate) -> (capacity, rounds, bars) — paper geometries: Monolith-64
# t=12 and t=8 (u=4), Monolith-31 t=16 (u=8).  KoalaBear is bar-safe (m = 24
# is a chunk boundary), so the 31-bit geometry extends to it; BabyBear's
# m = 27 is NOT byte-aligned, so ``bar_chunks`` splits the top byte
# (8,8,8,3,4) — the range-preservation lemma needs only SOME boundary at m
# (config.check_bar_field).  Both are in-repo extensions, not paper
# instances (docs/SECURITY.md).
_DEFAULTS = {
    ("goldilocks_fr", 8): (4, 6, 4),
    ("goldilocks_fr", 4): (4, 6, 4),
    ("mersenne31_fr", 8): (8, 6, 8),
    ("koalabear_fr", 8): (8, 6, 8),
    ("babybear_fr", 8): (8, 6, 8),
}


@functools.lru_cache(maxsize=None)
def get_default_monolith_parameters(fs: FieldSpec, rate: int = 8) -> MonolithConfig:
    """Default Monolith parameters (small-field sponge geometries only:
    Monolith is specified for small fields, where capacity must span
    multiple elements for 128-bit sponge security)."""
    key = (fs.name, rate)
    if key not in _DEFAULTS:
        raise ValueError(
            f"no default Monolith parameters for {fs.name} at rate={rate}: "
            f"the Bars layer requires p = 2^n - 2^m + 1 (Goldilocks rates "
            f"4/8; Mersenne31, KoalaBear, BabyBear rate 8)"
        )
    capacity, rounds, bars = _DEFAULTS[key]
    return generate_monolith_parameters(fs, rate, capacity, rounds, bars)
