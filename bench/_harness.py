"""Shared measurement harness for the bench probes.

Every probe follows the same protocol — seed lanes with random field
values, parity-gate the compiled tier against the scalar oracle (refuse to
print a number on mismatch), then time N warm repetitions and fetch a
result slice to force completion through the axon tunnel (where
``block_until_ready`` does not reliably block).  This module is that
protocol, single-sourced; the probes keep only their config/tier matrices.

Measurement caveat baked into ``time_perms``'s contract: the FIRST timed
window after a cold compile — or after seconds of device idleness (host-side
oracle work lets the chip clock down) — can be wildly wrong through the
tunnel: observed 745K vs a true 6.87M, and a round-4 audit caught the
single-window Monolith probe reporting 12.7-48M for a kernel whose warm rate
is ~105M perms/s.  ``time_perms`` therefore runs one UNTIMED warm window and
returns the best of ``windows`` timed windows; probes that compare variants
additionally re-measure the baseline on both sides of the candidate (order
control).
"""

from __future__ import annotations

import time

import numpy as np


def random_state(cfg, lanes, B, rng):
    """(vals, state_np): ``lanes`` random canonical elements per state row,
    zero-padded to batch ``B`` in Montgomery plane layout."""
    fs = cfg.field
    vals = [
        [int(v) % fs.modulus for v in rng.integers(0, 1 << 62, size=lanes)]
        for _ in range(cfg.t)
    ]
    state_np = np.zeros((cfg.t, fs.nlimbs, B), dtype=np.int32)
    state_np[:, :, :lanes] = np.stack(
        [fs.ints_to_mont_plane(row) for row in vals], axis=0
    )
    return vals, state_np


def oracle_states(cfg, vals, lanes, stride=13):
    """Scalar-oracle post-permutation states for lanes 0, stride, 2*stride…"""
    out = {}
    for b in range(0, lanes, stride):
        o = cfg.oracle_sponge()
        o.state = [vals[i][b] for i in range(cfg.t)]
        o.permute()
        out[b] = o.state
    return out


def parity_gate(cfg, out, vals, lanes, label, stride=13, oracle=None):
    """Raise unless ``out[:, :, :lanes]`` matches the oracle lanes exactly
    (mod p — redundant-representation outputs decode canonically)."""
    fs = cfg.field
    oracle = oracle or oracle_states(cfg, vals, lanes, stride)
    sub = np.asarray(out[:, :, :lanes])
    for b in range(0, lanes, stride):
        got = [
            fs.mont_limbs_to_int(sub[i][:, b]) % fs.modulus
            for i in range(cfg.t)
        ]
        want = [v % fs.modulus for v in oracle[b]]
        if got != want:
            raise RuntimeError(f"{label} PARITY FAILURE at lane {b}")


def timed_best(window_fn, windows=3):
    """Best rate over ``windows`` calls of ``window_fn`` (a thunk that runs
    one timed window, forces completion, and returns a rate), after one
    untimed warm call — the generic form of ``time_perms`` for workloads
    that are not state-in/state-out chainable (Merkle roots, transcripts)."""
    window_fn()  # warm: restores device clock after host-side idle
    return max(window_fn() for _ in range(windows))


def time_perms(fn, first_out, B, iters=5, windows=3):
    """Permutations/sec: one untimed warm window, then the best of
    ``windows`` timed windows of ``iters`` repetitions of ``fn`` (state in,
    state out), forcing completion with a host fetch of a result slice
    (``block_until_ready`` does not reliably block through the tunnel).

    The warm window restores the device clock after host-side idle periods
    and the best-of guards against dispatch hiccups — see the module
    docstring for the measured failure mode this prevents."""
    cur = first_out
    for _ in range(iters):
        cur = fn(cur)
    _ = np.asarray(cur[0, 0, :8])
    best = 0.0
    for _w in range(windows):
        cur = first_out
        t0 = time.perf_counter()
        for _ in range(iters):
            cur = fn(cur)
        _ = np.asarray(cur[0, 0, :8])
        best = max(best, iters * B / (time.perf_counter() - t0))
    return best
