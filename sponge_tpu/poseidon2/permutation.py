"""Batched Poseidon2 permutation over limb-plane state (XLA tier + dispatch).

TPU-native structure exploitation: the external matrix M_E multiplies the
state only by SMALL plain integers (entries <= 14 for every defined width),
and scaling a Montgomery-form limb plane by a plain integer is just
``c * x`` followed by carry renormalization — no REDC.  The internal layer
``M_I = J + diag(mu - 1)`` is one shared row sum plus a per-element
diagonal product.

**Value-growth discipline.**  Poseidon2's linear layers never Montgomery-
reduce, so element VALUES (not just limbs) would grow by the matrix row
sums round over round and silently overflow the L-limb window (values live
mod R = 2^(12 L); ``montgomery.carry_pass`` drops top carries by design).
This tier keeps every value provably < 2^262 << R by reducing through the
Montgomery machinery itself:

* internal rounds compute ``out_i = mont_mul(x_i, dm1_mont_i) + sigma_red``
  with ``sigma_red = mont_mul(sum_j x_j, one)`` — the one extra shared
  reduction per round bounds the invariant at < 2.3p;
* every external linear layer closes with a Montgomery-by-1 reduction, so
  row sums never compound (required for small-R/p fields: Goldilocks has
  R/p = 2^8, and the t = 12 block-circulant row sum alone is 64).

The Pallas tier (``ops.pallas_p2``) instead uses top-carry rho-folding to
avoid the per-element internal REDC entirely; this tier is its slow,
bound-transparent semantic reference, exactly like ``poseidon.permutation``
is for ``ops.pallas_cios``.

State layout matches Poseidon: (t, L, B) int32 Montgomery limb planes;
permutation outputs satisfy the framework-wide value < 2p invariant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import montgomery as mont
from ..ops.montgomery import normalize
from .config import Poseidon2Config


class ValueBoundError(ValueError):
    """The (field, width, alpha) combination overflows the XLA tier's exact
    value-bound analysis (an intermediate could reach the Montgomery radix R,
    where carry_pass would silently drop a top carry)."""


@functools.lru_cache(maxsize=None)
def check_value_bounds(cfg: Poseidon2Config) -> None:
    """Statically simulate worst-case VALUE bounds through the round schedule.

    Every Montgomery multiply requires operands < R and yields < T/R + p; the
    linear layers scale values by the matrix row sums without reducing.  The
    simulation iterates each phase past its round count to confirm the bounds
    reach a fixed point below R.  Raises ValueError otherwise — for the
    defined matrices and the framework's >= 4-bit limb headroom (R >= 16p)
    this only triggers for extreme widths on minimum-headroom fields.
    """
    fs = cfg.field
    p, R = fs.modulus, fs.r
    rs = max(sum(row) for row in cfg.mat_e)
    t = cfg.t

    def fail():
        raise ValueBoundError(
            f"Poseidon2 XLA tier value bound exceeds R for t={t} over "
            f"{fs.name} (R/p headroom too small); use the Pallas tier or "
            f"a wider limb plan"
        )

    def mul(a: int, b: int) -> int:
        if a >= R or b >= R:
            fail()
        return (a * b) // R + p + 1

    def sbox(v: int) -> int:
        x = v + p  # worst-case round-constant add
        acc = x
        for bit in bin(cfg.alpha)[2:][1:]:
            acc = mul(acc, acc)
            if bit == "1":
                acc = mul(acc, x)
        return acc

    def ext_linear(v: int) -> int:
        # Raw scaled sum must stay below R BEFORE its closing reduction.
        if rs * v >= R:
            fail()
        return mul(rs * v, p)

    V = ext_linear(p)  # canonical sponge inputs -> initial linear layer
    for _ in range(cfg.full_rounds // 2 + 2):
        V = ext_linear(sbox(V))
    for _ in range(cfg.partial_rounds + 2):
        s0 = sbox(V)
        v_el = max(V, s0)
        sigma_raw = t * v_el
        if sigma_raw >= R:
            fail()
        V = mul(v_el, p) + mul(sigma_raw, p)
    for _ in range(cfg.full_rounds // 2 + 2):
        V = ext_linear(sbox(V))


@functools.lru_cache(maxsize=None)
def device_constants2(cfg: Poseidon2Config):
    """Round constants / matrix data in device layout (numpy)."""
    fs = cfg.field
    ext = np.stack(
        [
            np.stack([fs.int_to_mont_limbs(c) for c in row], axis=0)
            for row in cfg.external_rc
        ],
        axis=0,
    ).astype(np.int32)[..., None]  # (R_F, t, L, 1)
    if cfg.partial_rounds:
        internal = np.stack(
            [fs.int_to_mont_limbs(c) for c in cfg.internal_rc], axis=0
        ).astype(np.int32)[..., None]  # (R_P, L, 1)
    else:
        internal = np.zeros((0, fs.nlimbs, 1), dtype=np.int32)
    mat_e = np.asarray(cfg.mat_e, dtype=np.int32)  # (t, t) small ints
    diag_m1 = np.stack(
        [fs.int_to_mont_limbs((d - 1) % fs.modulus) for d in cfg.mat_i_diag],
        axis=0,
    ).astype(np.int32)[..., None]  # (t, L, 1) Montgomery form
    return {"ext": ext, "internal": internal, "mat_e": mat_e, "diag_m1": diag_m1}


def _apply_external(fs, mat_e: jnp.ndarray, one: jnp.ndarray, state) -> jnp.ndarray:
    """M_E . state via plain small-int scaling, then one Montgomery-by-1
    reduction so values re-enter the < 2p regime every round.

    Limb bound of the raw sum: t * 14 * 2^12 < 2^21 (two carry passes restore
    <= 2^12); value bound row_sum * V_in < R is checked statically per config
    (``check_value_bounds``).  The closing reduction is what lets small-R/p
    fields (Goldilocks: R/p = 2^8) run wide states on this tier — without it
    the external row sums compound past R within one round.
    """
    raw = normalize(jnp.tensordot(mat_e, state, axes=1), passes=2)
    return mont.mont_mul(fs, raw, one)


def poseidon2_permute(cfg: Poseidon2Config, state: jnp.ndarray) -> jnp.ndarray:
    """Full Poseidon2 permutation on a (t, L, B) Montgomery limb-plane batch."""
    # Hard gate: a config whose worst-case values could reach R would corrupt
    # silently (carry_pass drops top carries); refuse to trace it.  lru_cached,
    # so this costs one dict lookup per call.
    check_value_bounds(cfg)
    fs = cfg.field
    consts = device_constants2(cfg)
    ext = jnp.asarray(consts["ext"])  # (R_F, t, L, 1)
    internal = jnp.asarray(consts["internal"])  # (R_P, L, 1)
    mat_e = jnp.asarray(consts["mat_e"])  # (t, t)
    diag_m1 = jnp.asarray(consts["diag_m1"])  # (t, L, 1)
    # Montgomery form of 1 (R mod p): mont_mul(x, one_m) = x * R * R^-1 = x —
    # a domain-preserving reduction to < 2p.  (field_consts' "one" is the
    # PLAIN integer 1, which would convert out of Montgomery form.)
    one = jnp.asarray(fs.int_to_limbs(fs.r_mod_p).astype(np.int32))[:, None]
    half = cfg.full_rounds // 2

    def external_round(r, st):
        st = mont.mont_add(fs, st, ext[r])
        st = mont.mont_pow(fs, st, cfg.alpha)
        return _apply_external(fs, mat_e, one, st)

    def internal_round(r, st):
        s0 = mont.mont_pow(fs, mont.mont_add(fs, st[0], internal[r]), cfg.alpha)
        st = jnp.concatenate([s0[None], st[1:]], axis=0)
        # M_I = J + diag(mu-1): shared row sum (Montgomery-reduced once so the
        # per-round invariant stays < 2.3p) + per-element diagonal product.
        sigma_raw = normalize(jnp.sum(st, axis=0), passes=2)  # value < t * 2.3p
        sigma = mont.mont_mul(fs, sigma_raw, one)  # < 1.1p
        prod = mont.mont_mul(fs, st, diag_m1)  # < 1.1p
        return normalize(prod + sigma[None], passes=2)  # < 2.3p

    state = _apply_external(fs, mat_e, one, state)  # initial linear layer
    state = jax.lax.fori_loop(0, half, external_round, state)
    state = jax.lax.fori_loop(0, cfg.partial_rounds, internal_round, state)
    state = jax.lax.fori_loop(half, cfg.full_rounds, external_round, state)
    # Every external linear layer ends in a Montgomery-by-1 reduction, so the
    # framework-wide < 2p output invariant holds without an exit step.
    return state


@functools.lru_cache(maxsize=None)
def poseidon2_permute_jit(cfg: Poseidon2Config):
    return jax.jit(functools.partial(poseidon2_permute, cfg))


def batched_permute2(cfg: Poseidon2Config, state, backend: str = "auto"):
    """Backend-dispatched Poseidon2 permutation (fused Pallas tier on TPU for
    tile-aligned batches, XLA tier otherwise)."""
    from ..ops.pallas_p2 import TILE_LANES, p2_permute_fn

    B = state.shape[-1]
    on_tpu = jax.default_backend() == "tpu"
    # "pallas" (Poseidon's readable-kernel name) is accepted as an alias of
    # the fused kernel so a Poseidon2Config drops into call sites that pin a
    # backend (hash.py / transcript.py / parallel thread it through verbatim).
    if backend in ("cios", "pallas") or (
        backend == "auto" and on_tpu and B % TILE_LANES == 0
    ):
        return p2_permute_fn(cfg)(state)
    if backend not in ("auto", "xla"):
        raise ValueError(f"unknown backend {backend!r}")
    return poseidon2_permute_jit(cfg)(state)
