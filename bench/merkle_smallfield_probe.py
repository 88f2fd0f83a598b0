"""Small-field Merkle tree probe: the production STARK commitment workload.

Over 31-bit fields a Merkle node digest is d = 8 elements (248 bits), so the
sponge-mode 2-to-1 compression (absorb 2d = 16 > rate = 8, squeeze d;
hash.compress_digest_pairs) costs TWO permutations per node, while the
Jive_2 permutation-mode compression (ePrint 2022/840 §4; hash.jive_compress_pairs,
d = t/2 = 8) costs exactly ONE — this probe measures both, over the fused
Monolith KoalaBear kernel (the fastest shipped permutation, 95.5M perms/s)
and the Poseidon2 small-field kernels.  Goldilocks gets the plonky2-exact
construction instead: d = 4 x 64-bit digests, 2d = rate = 8, one permutation
per node in plain sponge mode.

Parity gating (the probe refuses to print a number on mismatch):
  1. a full-chunk (2^17) single-level compress is checked lane-by-lane
     against a scalar python-int duplex reduction (oracle permute), and
  2. a small 16-leaf device tree root — which exercises the padded
     tail-ladder path (pad to the 2048 kernel tile) — is checked against a
     host oracle tree reduction.
The intermediate ladder shapes (2^15, 2^13) run the same kernel body at
different grid counts.

Run: python bench/merkle_smallfield_probe.py [kb_jive kb_wide gl_wide bb_jive]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax.numpy as jnp


def _oracle_permute(cfg, state):
    o = cfg.oracle_sponge()
    o.state = list(state)
    o.permute()
    return list(o.state)


def _oracle_compress_wide(cfg, left, right):
    """hash.compress_digest_pairs semantics over python ints: fresh sponge,
    absorb the 2d concatenated elements in rate chunks (permute between full
    chunks), flip permute, read d (d <= rate everywhere this probe runs)."""
    p = cfg.field.modulus
    d = len(left)
    elems = list(left) + list(right)
    state = [0] * cfg.t
    pos = 0
    while True:
        n = min(cfg.rate, 2 * d - pos)
        for i in range(n):
            state[cfg.capacity + i] = (state[cfg.capacity + i] + elems[pos + i]) % p
        pos += n
        if pos >= 2 * d:
            break
        state = _oracle_permute(cfg, state)
    state = _oracle_permute(cfg, state)
    return state[cfg.capacity : cfg.capacity + d]


def _oracle_compress_jive(cfg, left, right):
    """hash.jive_compress_pairs semantics: feed-forward sum over the two
    input blocks, digest_j = x_j + x_{d+j} + P(x)_j + P(x)_{d+j}."""
    p = cfg.field.modulus
    d = len(left)
    x = list(left) + list(right)
    px = _oracle_permute(cfg, x)
    return [(x[j] + x[d + j] + px[j] + px[d + j]) % p for j in range(d)]


def _oracle_root(cfg, grid, compress):
    level = grid  # [N][d] python ints
    while len(level) > 1:
        level = [
            compress(cfg, level[i], level[i + 1]) for i in range(0, len(level), 2)
        ]
    return level[0]


def _leaves_plane(fs, d, N, rng, lanes):
    """(grid, plane): ``lanes`` random digests then zeros, Montgomery planes."""
    grid = [
        [int(v) % fs.modulus for v in rng.integers(0, 1 << 62, size=d)]
        for _ in range(lanes)
    ]
    plane = np.zeros((d, fs.nlimbs, N), dtype=np.int32)
    for j in range(d):
        plane[j, :, :lanes] = fs.ints_to_mont_plane([g[j] for g in grid])
    return grid, plane


def _gate_level(cfg, d, root_fn, compress_dev, compress_oracle, label):
    """Gates 1+2 from the module docstring for one (config, mode)."""
    fs = cfg.field
    rng = np.random.default_rng(20260820)
    # gate 1: full-chunk single level vs oracle on sampled lanes
    B = 1 << 17
    lanes = 64
    gl, lp = _leaves_plane(fs, d, B, rng, lanes)
    gr, rp = _leaves_plane(fs, d, B, rng, lanes)
    out = np.asarray(compress_dev(jnp.asarray(lp), jnp.asarray(rp))[:, :, :lanes])
    for b in range(0, lanes, 13):
        want = compress_oracle(cfg, gl[b], gr[b])
        got = [fs.mont_limbs_to_int(out[j][:, b]) % fs.modulus for j in range(d)]
        if got != want:
            raise RuntimeError(f"{label} chunk-level PARITY FAILURE at lane {b}")
    # gate 2: 16-leaf device tree (padded tail ladder) vs oracle reduction
    N = 16
    grid, plane = _leaves_plane(fs, d, N, rng, N)
    root_dev = np.asarray(root_fn(jnp.asarray(plane)))
    want = _oracle_root(cfg, grid, compress_oracle)
    got = [fs.mont_limbs_to_int(root_dev[j]) % fs.modulus for j in range(d)]
    if got != want:
        raise RuntimeError(f"{label} tree-root PARITY FAILURE")
    print(f"parity gate: {label} matches oracle", file=sys.stderr, flush=True)


def _time_tree(cfg, d, root_fn, log_n, label, perms_per_node):
    fs = cfg.field
    N = 1 << log_n
    rng = np.random.default_rng(7)
    _, plane = _leaves_plane(fs, d, N, rng, 256)
    leaves = jnp.asarray(plane)
    root = root_fn(leaves)  # warm-up: compiles every ladder shape
    _ = np.asarray(root[0, :1])
    t0 = time.perf_counter()
    root = root_fn(leaves)
    _ = np.asarray(root[0, :1])
    dt = time.perf_counter() - t0
    row = {
        "metric": f"{label}_merkle_leaves_per_sec",
        "value": int(N / dt),
        "unit": "leaves/s",
        "log2_leaves": log_n,
        "perms_per_node": perms_per_node,
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    from sponge_tpu.utils.jaxcache import configure_cache

    configure_cache("/tmp/sponge_tpu_jax_cache")

    from sponge_tpu import (
        BABYBEAR_FR,
        GOLDILOCKS_FR,
        KOALABEAR_FR,
        get_default_monolith_parameters,
        get_default_poseidon2_parameters,
    )
    from sponge_tpu.hash import (
        compress_digest_pairs,
        jive_compress_pairs,
        merkle_root_jive,
        merkle_root_wide,
    )

    which = set(sys.argv[1:]) or {"kb_jive", "kb_wide", "gl_wide", "bb_jive"}
    log_n = 22

    if {"kb_jive", "kb_wide"} & which:
        cfg = get_default_monolith_parameters(KOALABEAR_FR)
        d = cfg.t // 2  # 8 x 31-bit = 248-bit digest
        if "kb_jive" in which:
            _gate_level(
                cfg, d,
                lambda lv: merkle_root_jive(cfg, lv),
                lambda a, b: jive_compress_pairs(cfg, a, b),
                _oracle_compress_jive, "koalabear_monolith_jive",
            )
            _time_tree(cfg, d, lambda lv: merkle_root_jive(cfg, lv), log_n,
                       "koalabear_monolith_jive", 1)
        if "kb_wide" in which:
            _gate_level(
                cfg, d,
                lambda lv: merkle_root_wide(cfg, lv),
                lambda a, b: compress_digest_pairs(cfg, a, b),
                _oracle_compress_wide, "koalabear_monolith_wide",
            )
            _time_tree(cfg, d, lambda lv: merkle_root_wide(cfg, lv), log_n,
                       "koalabear_monolith_wide", 2)

    if "gl_wide" in which:
        cfg = get_default_poseidon2_parameters(GOLDILOCKS_FR, 8)  # t = 12
        d = 4  # plonky2 digest: 4 x 64-bit, 2d = rate -> 1 perm/node
        _gate_level(
            cfg, d,
            lambda lv: merkle_root_wide(cfg, lv),
            lambda a, b: compress_digest_pairs(cfg, a, b),
            _oracle_compress_wide, "goldilocks_poseidon2_wide",
        )
        _time_tree(cfg, d, lambda lv: merkle_root_wide(cfg, lv), log_n,
                   "goldilocks_poseidon2_wide", 1)

    if "bb_jive" in which:
        cfg = get_default_poseidon2_parameters(BABYBEAR_FR, 8)  # t = 16
        d = cfg.t // 2
        _gate_level(
            cfg, d,
            lambda lv: merkle_root_jive(cfg, lv),
            lambda a, b: jive_compress_pairs(cfg, a, b),
            _oracle_compress_jive, "babybear_poseidon2_jive",
        )
        _time_tree(cfg, d, lambda lv: merkle_root_jive(cfg, lv), log_n,
                   "babybear_poseidon2_jive", 1)


if __name__ == "__main__":
    main()
