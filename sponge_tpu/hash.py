"""Fixed-shape Poseidon hashing built on the duplex sponge semantics.

These are the throughput workloads (BASELINE.json configs): batched 2-to-1
compression (one permutation per node — the duplex absorb of [l, r] into a fresh
rate-2 sponge is permutation-free until the squeeze mode flip), fixed-arity
hashing of element blocks, and Merkle tree reduction.  All of them are thin,
jit-friendly wrappers around the batched permutation; outputs are bit-exact with
running the reference sponge absorb/squeeze sequence (tested against the oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .ops import montgomery as mont
from .poseidon.config import PoseidonConfig
from .poseidon.permutation import batched_permute


def compress_pairs(
    cfg: PoseidonConfig, left: jnp.ndarray, right: jnp.ndarray, backend: str = "auto"
) -> jnp.ndarray:
    """Batched 2-to-1 compression: (L, B) x (L, B) Montgomery planes -> (L, B).

    Semantics = fresh sponge, absorb([l, r]), squeeze 1 native element
    (state layout capacity‖rate, zero-init, additive absorb — mod.rs:220,128;
    the single permutation happens at the absorb->squeeze mode flip,
    mod.rs:323-329).  Requires rate >= 2.
    """
    if cfg.rate < 2:
        raise ValueError("2-to-1 compression needs rate >= 2")
    L, B = left.shape[-2], left.shape[-1]
    zeros = jnp.zeros((cfg.capacity, L, B), dtype=jnp.int32)
    tail = jnp.zeros((cfg.rate - 2, L, B), dtype=jnp.int32)
    state = jnp.concatenate([zeros, left[None], right[None], tail], axis=0)
    out = batched_permute(cfg, state, backend)
    return out[cfg.capacity]


def hash_elements(
    cfg: PoseidonConfig, elems: jnp.ndarray, num_outputs: int = 1, backend: str = "auto"
) -> jnp.ndarray:
    """Batched fixed-length hash: (k, L, B) Montgomery element plane -> (n, L, B).

    Equivalent to: fresh sponge, absorb the k elements, squeeze ``num_outputs``
    native elements — evaluated with the minimal number of batched permutations
    (the duplex machine permutes every ``rate`` absorbed elements and at the
    squeeze flip; mod.rs:121-150, 321-341).
    """
    k, L, B = elems.shape
    state = jnp.zeros((cfg.t, L, B), dtype=jnp.int32)
    fs = cfg.field
    # absorb_internal chunking: add `rate` elements, permute, repeat; the final
    # (possibly partial) chunk is left unpermuted until the squeeze flip.
    pos = 0
    while True:
        chunk = elems[pos : pos + cfg.rate]
        n = chunk.shape[0]
        if n:
            rows = mont.mont_add(fs, state[cfg.capacity : cfg.capacity + n], chunk)
            state = jnp.concatenate(
                [state[: cfg.capacity], rows, state[cfg.capacity + n :]], axis=0
            )
        pos += n
        if pos >= k:
            break
        state = batched_permute(cfg, state, backend)
    state = batched_permute(cfg, state, backend)  # absorb -> squeeze flip
    # squeeze_internal chunking (mod.rs:153-182).  With rate_start_index = 0
    # (fresh squeeze) the no-permute quirk branch never triggers: every full
    # rate chunk is followed by a permutation.
    outs = []
    remaining = num_outputs
    while True:
        if remaining <= cfg.rate:
            outs.append(state[cfg.capacity : cfg.capacity + remaining])
            break
        outs.append(state[cfg.capacity : cfg.capacity + cfg.rate])
        remaining -= cfg.rate
        state = batched_permute(cfg, state, backend)
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def merkle_root(
    cfg: PoseidonConfig,
    leaves: jnp.ndarray,
    backend: str = "auto",
    chunk: int = 1 << 17,
) -> jnp.ndarray:
    """Single-device Merkle reduction: (L, N) Montgomery leaf plane -> (L,) root.

    N must be a power of two.  Each tree level is a batched 2-to-1 compression
    over contiguous pairs.  To keep the number of distinct compiled kernel
    shapes constant regardless of depth, wide levels are processed in
    fixed-size ``chunk`` slices and narrow levels are zero-padded up to one
    kernel tile (padding lanes compute a valid all-zero compression and are
    discarded) — two compiled shapes total instead of log2(N).
    See ``sponge_tpu.parallel.merkle`` for the sharded multi-device version.
    """
    L, N = leaves.shape
    if N & (N - 1):
        raise ValueError("leaf count must be a power of two")
    level = leaves
    while level.shape[-1] > 1:
        pairs = level.reshape(L, level.shape[-1] // 2, 2)
        level = _level_compress(cfg, pairs[..., 0], pairs[..., 1], backend, chunk)
    return level[:, 0]


def _level_compress(cfg, l, r, backend, chunk):
    """One tree level through a constant set of compiled kernel shapes: wide
    levels are sliced into ``chunk`` pieces, narrow levels (on TPU) are padded
    up to one chunk (padding lanes compute a valid all-zero compression)."""
    n = l.shape[-1]
    if n > chunk and n % chunk == 0:
        outs = [
            compress_pairs(cfg, l[..., i : i + chunk], r[..., i : i + chunk], backend)
            for i in range(0, n, chunk)
        ]
        return jnp.concatenate(outs, axis=-1)
    if n < chunk and jax.default_backend() == "tpu":
        pad = chunk - n
        lp = jnp.pad(l, [(0, 0), (0, pad)])
        rp = jnp.pad(r, [(0, 0), (0, pad)])
        return compress_pairs(cfg, lp, rp, backend)[..., :n]
    return compress_pairs(cfg, l, r, backend)


def merkle_tree(
    cfg: PoseidonConfig, leaves: jnp.ndarray, backend: str = "auto", chunk: int = 1 << 17
) -> list:
    """All levels of the Merkle tree, leaves first: [(L, N), (L, N/2), ..., (L, 1)].

    Level i+1[j] = compress(level i[2j], level i[2j+1]).  Needed for producing
    authentication paths; ``merkle_root(...) == merkle_tree(...)[-1][:, 0]``.
    """
    L, N = leaves.shape
    if N & (N - 1):
        raise ValueError("leaf count must be a power of two")
    levels = [leaves]
    while levels[-1].shape[-1] > 1:
        cur = levels[-1]
        pairs = cur.reshape(L, cur.shape[-1] // 2, 2)
        levels.append(
            _level_compress(cfg, pairs[..., 0], pairs[..., 1], backend, chunk)
        )
    return levels


def merkle_open(levels: list, index: int) -> list:
    """Authentication path for leaf ``index``: sibling limb columns, bottom-up.

    Returns ``[(L,) sibling at depth 0, ..., (L,) sibling below the root]``.
    """
    n = levels[0].shape[-1]
    if not 0 <= index < n:
        raise IndexError(f"leaf index {index} out of range for {n} leaves")
    path = []
    for level in levels[:-1]:
        path.append(level[:, index ^ 1])
        index >>= 1
    return path


def merkle_verify(
    cfg: PoseidonConfig,
    root: jnp.ndarray,
    leaf: jnp.ndarray,
    path: list,
    index: int,
    backend: str = "auto",
) -> bool:
    """Recompute the root from a leaf + authentication path and compare.

    ``root``/``leaf``/path entries are (L,) Montgomery limb columns (as produced
    by merkle_tree/merkle_open).  Comparison is on canonical values, so
    redundant-limb representations of equal field elements compare equal.
    """
    import numpy as np

    if not 0 <= index < (1 << len(path)):
        raise IndexError(f"leaf index {index} out of range for path depth {len(path)}")
    fs = cfg.field
    cur = leaf[:, None]
    for sibling in path:
        sib = sibling[:, None]
        l, r = (cur, sib) if index % 2 == 0 else (sib, cur)
        cur = compress_pairs(cfg, l, r, backend="xla" if backend == "auto" else backend)
        index >>= 1
    got = fs.mont_limbs_to_int(np.asarray(cur[:, 0]))
    want = fs.mont_limbs_to_int(np.asarray(root))
    return got == want
