"""Unit tests for bench/_harness.py's measurement protocol.

The harness is the single source of timing discipline for every probe and
for full_bench (round-4 hardening: one UNTIMED warm window, then best-of-N
timed windows — the audit that motivated it caught a single-window probe
reporting 12.7-48M perms/s for a kernel whose warm rate is ~105M).  These
tests pin the protocol itself: call counts, warm-window exclusion, best-of
selection, and the parity gate's refusal behavior.
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "bench"))

from _harness import oracle_states, parity_gate, random_state, time_perms, timed_best

from conftest import tiny_poseidon_config


def test_timed_best_warm_window_excluded():
    """The first (warm) call's rate must not be reported; best of the
    remaining windows is."""
    rates = iter([1.0, 5.0, 3.0, 4.0])
    calls = []

    def window():
        r = next(rates)
        calls.append(r)
        return r

    assert timed_best(window, windows=3) == 5.0
    assert calls == [1.0, 5.0, 3.0, 4.0]  # 1 warm + 3 timed


def test_time_perms_call_counts_and_chaining():
    """time_perms must run (1 + windows) windows of `iters` chained calls,
    restarting each timed window from the first output."""
    calls = []

    class FakeState:
        def __init__(self, tag):
            self.tag = tag

        def __getitem__(self, idx):
            return np.zeros(8)

    def fn(state):
        calls.append(state.tag)
        return FakeState(state.tag + 1)

    first = FakeState(0)
    rate = time_perms(fn, first, B=128, iters=4, windows=2)
    assert rate > 0
    # 1 warm + 2 timed windows, each 4 chained calls starting from tag 0.
    assert len(calls) == 12
    assert calls[0::4] == [0, 0, 0]  # every window restarts from first_out
    assert calls[:4] == [0, 1, 2, 3]  # and chains within the window


def test_parity_gate_refuses_on_mismatch():
    """The gate must raise (refuse to report) when the device result does
    not match the oracle — the repo-wide 'no unverified numbers' rule."""
    cfg = tiny_poseidon_config()
    rng = np.random.default_rng(3)
    lanes, B = 16, 32
    vals, state_np = random_state(cfg, lanes, B, rng)

    # Build the TRUE post-permutation planes from the oracle, then corrupt.
    oracle = oracle_states(cfg, vals, lanes, stride=13)
    fs = cfg.field
    out = np.zeros((cfg.t, fs.nlimbs, B), dtype=np.int32)
    for b, st in oracle.items():
        for i in range(cfg.t):
            out[i, :, b] = fs.int_to_mont_limbs(st[i])
    parity_gate(cfg, out, vals, lanes, "harness-selftest", stride=13)

    out[0, 0, 0] ^= 1
    with pytest.raises(RuntimeError, match="PARITY FAILURE"):
        parity_gate(cfg, out, vals, lanes, "harness-selftest", stride=13)
