"""Pallas kernel tiers vs oracle.

The CIOS kernel's arithmetic helpers are pure jnp over limb lists, so they are
unit-tested directly on CPU (no Pallas lowering needed); the readable fused
kernel is run through the Pallas interpreter; and the exact `_permute_kernel`
body (incl. the sparse-opt partial phase and SMEM constant indexing) runs
end-to-end in CI over the tiny 35-bit test field (conftest.TINY_FR), where the
unrolled trace compiles in seconds instead of hours.

Mosaic lowering of the compiled kernels cannot be exercised on CPU; on real TPU
hardware it is gated by bench.py's parity check, which refuses to report a
number unless both compiled kernels reproduce the oracle on random states.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sponge_tpu import BLS12_381_FR, BN254_FR, get_default_poseidon_parameters
from sponge_tpu.ops import montgomery as mont
from sponge_tpu.ops.pallas_cios import (
    _cios_mul,
    _cios_sqr,
    _mds_apply,
    _norm1,
    _pow_alpha,
)
from sponge_tpu.ops.pallas_permute import pallas_permute_fn
from sponge_tpu.poseidon.oracle import OraclePoseidonSponge

RNG = np.random.default_rng(17)


def rand_ints(fs, n):
    return [int(RNG.integers(0, 2 ** 63)) ** 4 % fs.modulus for _ in range(n)]


def to_limb_list(fs, xs):
    """ints -> list[L] of (1, len(xs)) arrays (Montgomery form)."""
    plane = fs.ints_to_mont_plane(xs)  # (L, B)
    return [jnp.asarray(plane[l : l + 1, :]) for l in range(fs.nlimbs)]


def from_limb_list(fs, limbs):
    plane = np.concatenate([np.asarray(l) for l in limbs], axis=0)
    return fs.mont_plane_to_ints(plane)


@pytest.mark.parametrize("fs", [BLS12_381_FR, BN254_FR], ids=lambda f: f.name)
def test_cios_mul_matches_oracle(fs):
    fc = mont.field_consts(fs)
    p_t, n0 = fc["p_tuple"], int(fc["n0inv"])
    xs, ys = rand_ints(fs, 8), rand_ints(fs, 8)
    out = _cios_mul(fs.nlimbs, to_limb_list(fs, xs), to_limb_list(fs, ys), p_t, n0)
    got = from_limb_list(fs, out)
    assert got == [x * y % fs.modulus for x, y in zip(xs, ys)]


@pytest.mark.parametrize("fs", [BLS12_381_FR, BN254_FR], ids=lambda f: f.name)
def test_cios_sqr_matches_oracle(fs):
    fc = mont.field_consts(fs)
    xs = rand_ints(fs, 8) + [0, 1, fs.modulus - 1]
    out = _cios_sqr(
        fs.nlimbs, to_limb_list(fs, xs), fc["p_tuple"], int(fc["n0inv"])
    )
    assert from_limb_list(fs, out) == [x * x % fs.modulus for x in xs]


@pytest.mark.parametrize("alpha", [5, 17, 257])
def test_cios_pow_matches_oracle(alpha):
    fs = BLS12_381_FR
    fc = mont.field_consts(fs)
    xs = rand_ints(fs, 4) + [0, 1, fs.modulus - 1]
    out = _pow_alpha(
        fs.nlimbs, to_limb_list(fs, xs), alpha, fc["p_tuple"], int(fc["n0inv"])
    )
    assert from_limb_list(fs, out) == [pow(x, alpha, fs.modulus) for x in xs]


def test_cios_mds_lazy_accumulation():
    """Lazy-REDC MDS row application == oracle matrix-vector product."""
    fs = BLS12_381_FR
    cfg = get_default_poseidon_parameters(fs, 2, False)
    fc = mont.field_consts(fs)
    mds_ints = tuple(
        tuple(tuple(int(v) for v in fs.int_to_mont_limbs(c)) for c in row)
        for row in cfg.mds
    )
    cols = [rand_ints(fs, 4) for _ in range(cfg.t)]
    elems = [to_limb_list(fs, c) for c in cols]
    out = _mds_apply(
        fs.nlimbs, cfg.t, elems, mds_ints, fc["p_tuple"], int(fc["n0inv"])
    )
    for i in range(cfg.t):
        want = [
            sum(cfg.mds[i][j] * cols[j][b] for j in range(cfg.t)) % fs.modulus
            for b in range(4)
        ]
        assert from_limb_list(fs, out[i]) == want


def test_norm1_exact():
    """One-pass sequential normalization is exact and canonical."""
    fs = BLS12_381_FR
    L = fs.nlimbs
    vals = np.asarray(
        RNG.integers(0, 1 << 30, size=(L, 6)), dtype=np.int64
    )  # redundant columns
    limbs_in = [jnp.asarray(vals[l : l + 1].astype(np.int32)) for l in range(L)]
    out = _norm1(limbs_in)
    got_plane = np.concatenate([np.asarray(l) for l in out], axis=0)
    for b in range(6):
        want = sum(int(vals[l, b]) << (12 * l) for l in range(L)) % (1 << (12 * L))
        assert fs.limbs_to_int(got_plane[:, b]) == want
        assert np.all(got_plane[:, b] <= 0xFFF)


def test_fused_kernel_interpret_matches_oracle():
    """The readable fused kernel through the Pallas interpreter (small batch)."""
    fs = BLS12_381_FR
    cfg = get_default_poseidon_parameters(fs, 2, False)
    B = 512
    vals = [rand_ints(fs, B) for _ in range(cfg.t)]
    state = jnp.stack([jnp.asarray(fs.ints_to_mont_plane(row)) for row in vals])
    out = np.asarray(pallas_permute_fn(cfg, interpret=True)(state))
    for b in range(0, B, 127):
        o = OraclePoseidonSponge(cfg)
        o.state = [vals[i][b] for i in range(cfg.t)]
        o.permute()
        got = [fs.mont_limbs_to_int(out[i][:, b]) for i in range(cfg.t)]
        assert got == o.state


class _FakeRef:
    """Minimal pl.Ref stand-in: lets the exact kernel function body run outside
    Pallas (jnp arrays support the same indexing; fori_loop dynamic indexing on
    arrays works on CPU).  Covers all kernel-side plumbing — SMEM constant
    layout/indexing, pack/unpack, phase boundaries — except Mosaic lowering."""

    def __init__(self, arr):
        self.arr = jnp.asarray(arr)

    def __getitem__(self, idx):
        return self.arr[idx]

    def __setitem__(self, idx, value):
        self.arr = self.arr.at[idx].set(value)


def _run_cios_kernel_body(
    cfg, optimized, B=256, stride=85, pipelined=False, lane_streams=1,
    mds_group=None, relaxed=False, wide_interleave=False, mds_mxu=False,
):
    """Run _permute_kernel itself (mock refs, CPU) against the oracle."""
    from sponge_tpu.ops import pallas_cios as pc

    fs = cfg.field
    L, t = fs.nlimbs, cfg.t
    vals = [rand_ints(fs, B) for _ in range(t)]
    st4 = jnp.asarray(
        np.stack([fs.ints_to_mont_plane(row) for row in vals], axis=0)
    ).reshape(t, L, B // 128, 128)

    ark_np = np.stack(
        [np.concatenate([fs.int_to_mont_limbs(c) for c in row]) for row in cfg.ark]
    ).astype(np.int32)
    if optimized:
        from sponge_tpu.poseidon.optimized import optimized_partial_layers

        layers = optimized_partial_layers(cfg)
        popt_np = np.stack(
            [
                np.concatenate(
                    [fs.int_to_mont_limbs(v) for v in c]
                    + [fs.int_to_mont_limbs(v) for v in sp.row0]
                    + [fs.int_to_mont_limbs(v) for v in sp.col0]
                )
                for c, sp in zip(layers.constants, layers.sparse)
            ]
        ).astype(np.int32)
    else:
        popt_np = np.zeros((1, 1), dtype=np.int32)

    if mds_mxu:
        mds_ints = tuple(
            tuple(tuple(int(v) for v in fs.int_to_mont_limbs(c)) for c in row)
            for row in cfg.mds
        )
        mdsw = jnp.asarray(
            pc._mds_mxu_weights(L, t, mds_ints), dtype=jnp.bfloat16
        )
    else:
        mdsw = None

    @jax.jit
    def run(ark, popt, st):
        out_ref = _FakeRef(jnp.zeros_like(st))
        pc._permute_kernel(
            _FakeRef(ark), _FakeRef(popt), _FakeRef(st), out_ref,
            cfg=cfg, optimized=optimized, pipelined=pipelined,
            lane_streams=lane_streams, mds_group=mds_group, relaxed=relaxed,
            wide_interleave=wide_interleave,
            mdsw_ref=None if mdsw is None else _FakeRef(mdsw),
        )
        return out_ref.arr

    out = np.asarray(run(ark_np, popt_np, st4)).reshape(t, L, B)

    for b in range(0, B, stride):
        o = OraclePoseidonSponge(cfg)
        o.state = [vals[i][b] for i in range(t)]
        o.permute()
        got = [fs.mont_limbs_to_int(out[i][:, b]) for i in range(t)]
        assert got == o.state, (optimized, b)


@pytest.mark.parametrize("pipelined", [False, True], ids=["serial", "pipelined"])
@pytest.mark.parametrize("optimized", [False, True], ids=["dense", "sparse-opt"])
def test_cios_kernel_body_tiny_field(optimized, pipelined):
    """Always-on CI run of the exact kernel body (dense + sparse-opt phases,
    serial + chain-interleaved emission) over the tiny 35-bit field, where the
    unrolled trace compiles in seconds."""
    from conftest import tiny_poseidon_config

    _run_cios_kernel_body(
        tiny_poseidon_config(), optimized, stride=31, pipelined=pipelined
    )


@pytest.mark.parametrize("pipelined", [False, True], ids=["serial", "pipelined"])
@pytest.mark.parametrize("optimized", [False, True], ids=["dense", "sparse-opt"])
def test_cios_kernel_body_tiny_field_alpha17(optimized, pipelined):
    """Same, with the production S-box exponent and a longer partial chain."""
    from conftest import tiny_poseidon_config

    cfg = tiny_poseidon_config(full_rounds=8, partial_rounds=8, alpha=17, seed=11)
    _run_cios_kernel_body(cfg, optimized, stride=31, pipelined=pipelined)


@pytest.mark.parametrize("optimized", [False, True], ids=["dense", "sparse-opt"])
def test_cios_kernel_body_tiny_field_lane_streams(optimized):
    """Lane-stream-interleaved kernel (2 independent sub-tiles in lockstep)
    matches the oracle bit-for-bit."""
    from conftest import tiny_poseidon_config

    cfg = tiny_poseidon_config(full_rounds=8, partial_rounds=8, alpha=17, seed=11)
    _run_cios_kernel_body(cfg, optimized, stride=31, lane_streams=2)


@pytest.mark.parametrize(
    "variant", ["serial", "pipelined", "streams"], ids=["serial", "pipelined", "streams"]
)
@pytest.mark.parametrize("optimized", [False, True], ids=["dense", "sparse-opt"])
def test_cios_kernel_body_grouped_mds(optimized, variant):
    """Grouped lazy-MDS accumulation (the wide-state int32-safety path, t >= 5
    at production L) matches the oracle in all three emission variants.

    Group splitting is forced via ``mds_group`` because at tiny L the int32
    budget would otherwise never split; a t=5 config exercises the same
    row/column bookkeeping at a width that NEEDS grouping at L=22."""
    from conftest import tiny_poseidon_config

    cfg = tiny_poseidon_config(t=5, full_rounds=4, partial_rounds=5, alpha=5, seed=13)
    _run_cios_kernel_body(
        cfg, optimized, stride=37, mds_group=2,
        pipelined=(variant == "pipelined"),
        lane_streams=2 if variant == "streams" else 1,
    )


@pytest.mark.parametrize(
    "variant", ["serial", "pipelined", "streams"], ids=["serial", "pipelined", "streams"]
)
@pytest.mark.parametrize("optimized", [False, True], ids=["dense", "sparse-opt"])
def test_cios_kernel_body_relaxed_norm(optimized, variant):
    """The relaxed (chain-free epsilon-redundant normalization) kernel matches
    the oracle bit-for-bit in all three emission variants: quasi-canonical
    limbs between rounds, exact canonicalization at kernel exit."""
    from conftest import tiny_poseidon_config

    cfg = tiny_poseidon_config(full_rounds=8, partial_rounds=8, alpha=17, seed=11)
    _run_cios_kernel_body(
        cfg, optimized, stride=31, relaxed=True,
        pipelined=(variant == "pipelined"),
        lane_streams=2 if variant == "streams" else 1,
    )


@pytest.mark.parametrize(
    "variant", ["serial", "pipelined", "streams"], ids=["serial", "pipelined", "streams"]
)
@pytest.mark.parametrize("optimized", [False, True], ids=["dense", "sparse-opt"])
def test_cios_kernel_body_relaxed_grouped_mds(optimized, variant):
    """Relaxed norm combined with grouped lazy-MDS accumulation (the wide-state
    path, with its tightened quasi-limb int32 budget), in all three emission
    variants.  The pipelined cell is the round-2 regression's untested sibling
    (relaxed + pipelined + grouped hit the same ``_sparse_combine`` bug)."""
    from conftest import tiny_poseidon_config

    cfg = tiny_poseidon_config(t=5, full_rounds=4, partial_rounds=5, alpha=5, seed=13)
    _run_cios_kernel_body(
        cfg, optimized, stride=37, mds_group=2, relaxed=True,
        pipelined=(variant == "pipelined"),
        lane_streams=2 if variant == "streams" else 1,
    )


@pytest.mark.parametrize("relaxed", [False, True], ids=["exact", "relaxed"])
@pytest.mark.parametrize(
    "variant", ["serial", "streams"], ids=["serial", "streams"]
)
def test_cios_kernel_body_mds_mxu(variant, relaxed):
    """The MXU MDS path (6-bit-plane bf16 limb-convolution matmul + rebin,
    docs/DESIGN.md §24) matches the oracle bit-for-bit in both kernel
    emission variants, exact and relaxed norms."""
    from conftest import tiny_poseidon_config

    cfg = tiny_poseidon_config(full_rounds=8, partial_rounds=8, alpha=17, seed=11)
    _run_cios_kernel_body(
        cfg, False, stride=31, relaxed=relaxed, mds_mxu=True,
        lane_streams=2 if variant == "streams" else 1,
    )


@pytest.mark.parametrize("optimized", [False, True], ids=["dense", "sparse-opt"])
def test_cios_kernel_body_mds_mxu_wide(optimized):
    """MXU MDS at a wide state (t=5): the single matmul replaces the grouped
    lazy accumulation entirely (no int32 grouping needed — the f32 bound
    holds at any t), composed with the sparse-opt partial phase whose final
    dense matrix D stays on the VPU path."""
    from conftest import tiny_poseidon_config

    cfg = tiny_poseidon_config(t=5, full_rounds=4, partial_rounds=5, alpha=5, seed=13)
    _run_cios_kernel_body(
        cfg, optimized, stride=37, relaxed=True, mds_mxu=True, lane_streams=2
    )


def test_cios_pallas_mds_mxu_interpret():
    """cios_permute_fn(mds_mxu=True) through the Pallas interpreter: the
    weight-matrix input plumbing (extra VMEM operand) and the in-kernel
    dot_general, vs the oracle."""
    from conftest import tiny_poseidon_config

    from sponge_tpu.ops.pallas_cios import TILE_LANES, cios_permute_fn
    from sponge_tpu.poseidon import OraclePoseidonSponge

    cfg = tiny_poseidon_config(full_rounds=4, partial_rounds=4, alpha=5, seed=3)
    fs = cfg.field
    B = TILE_LANES
    vals = [rand_ints(fs, B) for _ in range(cfg.t)]
    state = jnp.asarray(
        np.stack([fs.ints_to_mont_plane(row) for row in vals], axis=0)
    )
    out = np.asarray(cios_permute_fn(cfg, interpret=True, mds_mxu=True)(state))
    for b in range(0, B, 293):
        o = OraclePoseidonSponge(cfg)
        o.state = [vals[i][b] for i in range(cfg.t)]
        o.permute()
        got = [fs.mont_limbs_to_int(out[i][:, b]) for i in range(cfg.t)]
        assert got == o.state, b


def test_relaxed_norm_exactness():
    """_relaxed_norm preserves the represented value exactly and lands limbs
    within the QUASI_LIMB_MAX bound, for REDC-tail-sized random inputs."""
    from sponge_tpu.ops.pallas_cios import (
        QUASI_LIMB_MAX,
        _relaxed_norm,
    )
    from sponge_tpu.fields import LIMB_BITS

    rng = np.random.default_rng(7)
    L = 22
    for _ in range(50):
        # Value must stay < 2^(12L) (the kernel invariant): build limbs whose
        # total value is bounded like a REDC tail (< ~2^258 here).
        limbs = [int(v) for v in rng.integers(0, 1 << 30, size=L)]
        limbs[-1] = int(rng.integers(0, 32))
        limbs[-2] = int(rng.integers(0, 1 << 17))
        value = sum(v << (LIMB_BITS * k) for k, v in enumerate(limbs))
        out = _relaxed_norm([jnp.asarray([v]) for v in limbs], passes=2)
        out_ints = [int(np.asarray(o)[0]) for o in out]
        assert all(0 <= v <= QUASI_LIMB_MAX for v in out_ints), out_ints
        got = sum(v << (LIMB_BITS * k) for k, v in enumerate(out_ints))
        assert got == value


@pytest.mark.skipif(
    not __import__("os").environ.get("SPONGE_TPU_SLOW_TESTS"),
    reason="XLA-CPU compile of the unrolled kernel body at L=22 is impractically "
    "slow (observed > 3 h in this environment); set SPONGE_TPU_SLOW_TESTS=1 to "
    "attempt it.  The same kernel body runs in default CI over the tiny field "
    "(tests above), and on TPU the compiled kernel is parity-gated by bench.py "
    "before any benchmark number is reported.",
)
@pytest.mark.parametrize("optimized", [False, True], ids=["dense", "sparse-opt"])
def test_cios_kernel_body_end_to_end(optimized):
    cfg = get_default_poseidon_parameters(BLS12_381_FR, 2, False)
    _run_cios_kernel_body(cfg, optimized)


@pytest.mark.parametrize("relaxed", [False, True], ids=["exact", "relaxed"])
@pytest.mark.parametrize("optimized", [False, True], ids=["dense", "sparse-opt"])
def test_cios_kernel_body_wide_interleave(optimized, relaxed):
    """The wide-interleave emission (all independent chains of a schedule
    point in one _redc_multi/_pow_alpha_multi: full-round S-boxes, MDS rows,
    sparse column lists) is arithmetic-identical to the 2-way streams kernel
    — oracle bit-exactness over the tiny field, grouped MDS forced."""
    from conftest import tiny_poseidon_config

    cfg = tiny_poseidon_config(t=5, full_rounds=4, partial_rounds=5, alpha=5, seed=13)
    _run_cios_kernel_body(
        cfg, optimized, stride=37, mds_group=2, relaxed=relaxed,
        lane_streams=2, wide_interleave=True,
    )
