"""Seeded config-space differential fuzzer for the Pallas kernel flag matrix.

Motivation (round-2 regression): the CIOS kernel's emission flags compose —
optimized x pipelined x lane_streams x mds_group x relaxed — and hand-enumerated
variant tests had holes exactly where flags composed (the `pipelined + grouped`
cell crashed at trace time; its `relaxed` sibling was untested).  This fuzzer
draws a seeded random sample over the FULL flag product plus config shape
(field limb count, t, alpha, round counts) and runs each draw's kernel body
against the Python oracle, so untested composition cells are a matter of
sampling coverage rather than hand enumeration.

Reference anchor: /root/reference/src/poseidon/tests.rs:8-24 applies the same
randomized-differential style (random field elements through two
implementations); here the random dimension is the *kernel configuration*.

Coverage is asserted post-hoc for the pinned seed: if a refactor changes the
draw logic and silently loses the known-dangerous cells, the meta-test fails
loudly rather than letting coverage rot.
"""

import numpy as np
import pytest

from conftest import TINY_FR, TINY_FR_45, tiny_poseidon_config

from test_pallas_kernels import _run_cios_kernel_body

FUZZ_SEED = 20260821
N_DRAWS = 14

_FIELDS = {"tiny35": TINY_FR, "tiny45": TINY_FR_45}


def _draw_configs(seed: int, n: int):
    """n seeded uniform draws over the kernel config space.

    Every flag is drawn independently so composition cells appear with
    product probability; the pinned seed is checked by
    test_fuzz_coverage_includes_regression_cells below.
    """
    rng = np.random.default_rng(seed)
    draws = []
    for i in range(n):
        field = "tiny35" if int(rng.integers(2)) == 0 else "tiny45"
        t = int(rng.integers(2, 7))
        alpha = int(rng.choice([3, 5, 17]))
        full_rounds = int(rng.choice([2, 4]))
        partial_rounds = int(rng.integers(2, 7))
        optimized = bool(rng.integers(2))
        variant = ["serial", "pipelined", "streams"][int(rng.integers(3))]
        mds_group = [None, 2][int(rng.integers(2))]
        relaxed = bool(rng.integers(2))
        # Drawn from a per-draw side stream so adding this axis (round 4)
        # does not shift the pinned main-stream draws the coverage meta-test
        # depends on.  The MXU path composes with everything: optimized keeps
        # its sparse partial phase and VPU-dense final D, mds_group still
        # shapes those VPU sites, and the mxu MDS emission is _redc_multi
        # (already interleaved) under every variant.
        mds_mxu = bool(np.random.default_rng(seed * 1000 + i).integers(2))
        draws.append(
            dict(
                field=field,
                t=t,
                alpha=alpha,
                full_rounds=full_rounds,
                partial_rounds=partial_rounds,
                optimized=optimized,
                variant=variant,
                mds_group=mds_group,
                relaxed=relaxed,
                mds_mxu=mds_mxu,
                cfg_seed=seed + i,
            )
        )
    return draws


_DRAWS = _draw_configs(FUZZ_SEED, N_DRAWS)


def _grouped(d):
    """True when the draw actually splits the lazy-MDS accumulation: at tiny L
    the int32 budget never splits on its own, so only a forced mds_group=2
    with t > 2 yields more than one group (see _mds_groups)."""
    return d["mds_group"] == 2 and d["t"] > 2


def _cell_id(d):
    return (
        f"{d['field']}-t{d['t']}-a{d['alpha']}-rf{d['full_rounds']}"
        f"-rp{d['partial_rounds']}-{'opt' if d['optimized'] else 'dense'}"
        f"-{d['variant']}-g{d['mds_group']}-{'relaxed' if d['relaxed'] else 'exact'}"
        f"{'-mxu' if d['mds_mxu'] else ''}"
    )


def test_fuzz_coverage_includes_regression_cells():
    """The pinned seed must cover the round-2 regression cells (pipelined +
    grouped, both exact and relaxed) and every value of each flag axis."""
    cells = {
        (d["variant"], _grouped(d), d["relaxed"], d["optimized"]) for d in _DRAWS
    }
    # Both round-2 broken cells: pipelined + actually-grouped, exact + relaxed
    # (the optimized axis is covered separately below — the grouped-row bug
    # lives in _sparse_combine/_mds_apply recombination, hit either way).
    assert any(v == "pipelined" and g and not r for v, g, r, _ in cells), cells
    assert any(v == "pipelined" and g and r for v, g, r, _ in cells), cells
    # Every axis value appears somewhere.
    assert {d["variant"] for d in _DRAWS} == {"serial", "pipelined", "streams"}
    assert {d["field"] for d in _DRAWS} == {"tiny35", "tiny45"}
    assert {d["optimized"] for d in _DRAWS} == {False, True}
    assert {d["relaxed"] for d in _DRAWS} == {False, True}
    assert {d["mds_group"] for d in _DRAWS} == {None, 2}
    assert {d["alpha"] for d in _DRAWS} == {3, 5, 17}
    assert {d["mds_mxu"] for d in _DRAWS} == {False, True}


@pytest.mark.parametrize("draw", _DRAWS, ids=_cell_id)
def test_fuzz_cios_kernel_config(draw):
    """One fuzz draw: run the exact kernel body (mock refs, CPU) on 256 random
    states and compare bit-for-bit against the oracle."""
    cfg = tiny_poseidon_config(
        t=draw["t"],
        full_rounds=draw["full_rounds"],
        partial_rounds=draw["partial_rounds"],
        alpha=draw["alpha"],
        seed=draw["cfg_seed"],
        field=_FIELDS[draw["field"]],
    )
    _run_cios_kernel_body(
        cfg,
        draw["optimized"],
        stride=85,
        pipelined=(draw["variant"] == "pipelined"),
        lane_streams=2 if draw["variant"] == "streams" else 1,
        mds_group=draw["mds_group"],
        relaxed=draw["relaxed"],
        mds_mxu=draw["mds_mxu"],
    )
