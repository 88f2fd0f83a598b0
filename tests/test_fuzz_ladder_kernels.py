"""Seeded config-space differential fuzzer for the ladder-family kernels.

Same motivation as tests/test_fuzz_kernel_configs.py (the round-2 lesson:
hand-enumerated variant tests miss exactly the cells where flags compose):
the Rescue / Griffin / Anemoi fused kernels compose
relaxed x lane_streams x ladder schedule (run-length vs fixed-window at
several widths) x family shape (rate, rounds) x Griffin's reduce_linear.
This fuzzer draws a seeded random sample over that product and runs each
draw's kernel body (mock refs, CPU) against the family's Python oracle.

Reference anchor: /root/reference/src/poseidon/tests.rs:8-24 (randomized
differential style); the random dimension here is the kernel configuration.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sponge_tpu.fields import FieldSpec

from test_pallas_kernels import _FakeRef

FUZZ_SEED = 20260822
N_DRAWS = 12

FS25 = FieldSpec(name="tiny_fr_25", modulus=(1 << 25) - 39, generator=3)

# (family, legal rates over the tiny field): Griffin needs t = 3 or 4k;
# Anemoi needs t even.
_FAMILY_RATES = {
    "rescue": (1, 2, 3),
    "griffin": (2, 3),
    "anemoi": (1, 3),
}


def _draw_configs(seed: int, n: int):
    rng = np.random.default_rng(seed)
    draws = []
    for i in range(n):
        family = ["rescue", "griffin", "anemoi"][int(rng.integers(3))]
        rate = int(rng.choice(_FAMILY_RATES[family]))
        rounds = int(rng.integers(2, 4))
        relaxed = bool(rng.integers(2))
        lane_streams = int(rng.choice([1, 2]))
        ladder_window = [None, 2, 3][int(rng.integers(3))]
        reduce_linear = bool(rng.integers(2)) if family == "griffin" else False
        reduce_pht = bool(rng.integers(2)) if family == "anemoi" else False
        draws.append(
            dict(
                family=family,
                rate=rate,
                rounds=rounds,
                relaxed=relaxed,
                lane_streams=lane_streams,
                ladder_window=ladder_window,
                reduce_linear=reduce_linear,
                reduce_pht=reduce_pht,
            )
        )
    return draws


_DRAWS = _draw_configs(FUZZ_SEED, N_DRAWS)


def _cell_id(d):
    w = d["ladder_window"]
    return (
        f"{d['family']}-r{d['rate']}-n{d['rounds']}"
        f"-{'relaxed' if d['relaxed'] else 'exact'}-s{d['lane_streams']}"
        f"-{'runlen' if w is None else f'w{w}'}"
        + ("-redlin" if d["reduce_linear"] else "")
        + ("-redpht" if d["reduce_pht"] else "")
    )


def test_fuzz_coverage_spans_flag_axes():
    """The pinned seed must cover every family, both ladder schedule kinds,
    both norms, both stream counts, and Griffin's reduce_linear cell."""
    assert {d["family"] for d in _DRAWS} == {"rescue", "griffin", "anemoi"}
    assert {d["ladder_window"] is None for d in _DRAWS} == {True, False}
    assert {d["relaxed"] for d in _DRAWS} == {False, True}
    assert {d["lane_streams"] for d in _DRAWS} == {1, 2}
    assert any(d["reduce_linear"] for d in _DRAWS)
    assert any(d["reduce_pht"] for d in _DRAWS)
    # window x streams composition appears (the fixed-window select-sum and
    # the stream split interact in chain indexing)
    assert any(
        d["ladder_window"] is not None and d["lane_streams"] == 2
        for d in _DRAWS
    )


def _build(family, rate, rounds):
    if family == "rescue":
        from sponge_tpu.rescue.params import generate_rescue_parameters

        return generate_rescue_parameters(FS25, rate, rounds=rounds)
    if family == "griffin":
        from sponge_tpu.griffin.params import generate_griffin_parameters

        return generate_griffin_parameters(FS25, rate, rounds=rounds)
    from sponge_tpu.anemoi.params import generate_anemoi_parameters

    return generate_anemoi_parameters(FS25, rate, rounds=rounds)


def _schedule_np(cfg, ladder_window):
    from sponge_tpu.ops.pallas_rescue import _exponent_runs, _window_schedule

    if ladder_window is None:
        runs, _ = _exponent_runs(cfg.inv_alpha)
        return np.asarray(runs, dtype=np.int32)
    _lead, digits = _window_schedule(cfg.inv_alpha, ladder_window)
    return np.asarray(digits, dtype=np.int32)


def _run_kernel_body(draw, cfg, st4, sched_np):
    fs = cfg.field
    kw = dict(
        cfg=cfg,
        lane_streams=draw["lane_streams"],
        relaxed=draw["relaxed"],
        ladder_window=draw["ladder_window"],
    )
    if draw["family"] == "rescue":
        from sponge_tpu.ops import pallas_rescue as mod

        kernel = mod._rescue_kernel
        rc_np = np.stack(
            [
                np.concatenate([fs.int_to_mont_limbs(c) for c in row])
                for row in cfg.rc
            ]
        ).astype(np.int32)
    elif draw["family"] == "griffin":
        from sponge_tpu.ops import pallas_griffin as mod

        kernel = mod._griffin_kernel
        kw["reduce_linear"] = draw["reduce_linear"]
        zero_row = tuple(0 for _ in range(cfg.t))
        rc_np = np.stack(
            [
                np.concatenate([fs.int_to_mont_limbs(c) for c in row])
                for row in tuple(cfg.rc) + (zero_row,)
            ]
        ).astype(np.int32)
    else:
        from sponge_tpu.ops import pallas_anemoi as mod

        kernel = mod._anemoi_kernel
        kw["reduce_pht"] = draw["reduce_pht"]
        rc_np = np.stack(
            [
                np.concatenate(
                    [fs.int_to_mont_limbs(c) for c in rx]
                    + [fs.int_to_mont_limbs(c) for c in ry]
                )
                for rx, ry in zip(cfg.rc_x, cfg.rc_y)
            ]
        ).astype(np.int32)

    @jax.jit
    def run(rc, sched, st):
        out_ref = _FakeRef(jnp.zeros_like(st))
        kernel(_FakeRef(rc), _FakeRef(sched), _FakeRef(st), out_ref, **kw)
        return out_ref.arr

    return np.asarray(run(rc_np, sched_np, st4))


@pytest.mark.parametrize("draw", _DRAWS, ids=_cell_id)
def test_fuzz_ladder_kernel_config(draw):
    """One fuzz draw: the family kernel body on 256 random states, bit-exact
    vs the family oracle (and the exit limb/value contract)."""
    cfg = _build(draw["family"], draw["rate"], draw["rounds"])
    fs = cfg.field
    t, L, B = cfg.t, fs.nlimbs, 256
    import zlib

    # crc32, not hash(): str hash is salted per process and would re-roll
    # the fuzz inputs on every run, making failures unreproducible.
    rng = np.random.default_rng(FUZZ_SEED ^ (zlib.crc32(_cell_id(draw).encode()) & 0xFFFF))
    vals = [
        [int(v) % fs.modulus for v in rng.integers(0, 1 << 62, size=B)]
        for _ in range(t)
    ]
    st4 = jnp.asarray(
        np.stack([fs.ints_to_mont_plane(row) for row in vals], axis=0)
    ).reshape(t, L, B // 128, 128)
    out = _run_kernel_body(
        draw, cfg, st4, _schedule_np(cfg, draw["ladder_window"])
    ).reshape(t, L, B)
    for b in range(0, B, 61):
        o = cfg.oracle_sponge()
        o.state = [vals[i][b] for i in range(t)]
        o.permute()
        got = [fs.mont_limbs_to_int(out[i][:, b]) for i in range(t)]
        assert got == o.state, (draw, b)
        for i in range(t):
            assert fs.limbs_to_int(out[i][:, b]) < 2 * fs.modulus
            assert all(int(v) < (1 << 12) for v in out[i][:, b])
