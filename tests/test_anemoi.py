"""Anemoi family: structure, Flystel invertibility, oracle golden
regression, XLA tier vs oracle, duplex integration.

Ground truth is the scalar oracle; golden values are frozen self-consistent
instances (docs/SECURITY.md provenance table).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
import pytest

from sponge_tpu import (
    BLS12_381_FR as FR,
    GOLDILOCKS_FR as GL,
    MERSENNE31_FR as M31,
)
from sponge_tpu.anemoi import (
    AnemoiConfig,
    OracleAnemoiSponge,
    anemoi_default_rounds,
    generate_anemoi_parameters,
    get_default_anemoi_parameters,
)
from sponge_tpu.anemoi.permutation import anemoi_permute_jit
from sponge_tpu.poseidon.oracle import OraclePoseidonSponge

CFG = get_default_anemoi_parameters(FR, 1)  # t = 2, the Jive-mode width


def rand_fr(fs, n, seed=7):
    rng = np.random.default_rng(seed)
    return [int(v) % fs.modulus for v in rng.integers(0, 1 << 62, size=n)]


def test_structure_and_defaults():
    assert CFG.t == 2 and CFG.l == 1 and CFG.alpha == 5 and CFG.g == 7
    assert CFG.rounds == anemoi_default_rounds(1) == 25
    assert CFG.alpha * CFG.inv_alpha % (FR.modulus - 1) == 1
    assert CFG.g * CFG.g_inv % FR.modulus == 1
    cfg4 = get_default_anemoi_parameters(FR, 3)
    assert cfg4.l == 2 and cfg4.mat_x == (
        (1, 7), (7, 50),
    )  # the paper's [[1, g], [g, g^2+1]]
    cfg8 = get_default_anemoi_parameters(GL, 4)
    assert cfg8.t == 8 and cfg8.l == 4 and cfg8.rounds == 14


def test_config_validation():
    with pytest.raises(ValueError, match="must be even"):
        generate_anemoi_parameters(FR, 2, capacity=1)  # t = 3
    with pytest.raises(ValueError, match="not invertible"):
        AnemoiConfig(
            field=FR, rounds=2, alpha=3, g=7, mat_x=CFG.mat_x,
            rc_x=CFG.rc_x[:2], rc_y=CFG.rc_y[:2], rate=1, capacity=1,
        )
    with pytest.raises(ValueError, match="rc_x must have"):
        AnemoiConfig(
            field=FR, rounds=3, alpha=5, g=7, mat_x=CFG.mat_x,
            rc_x=CFG.rc_x[:2], rc_y=CFG.rc_y[:3], rate=1, capacity=1,
        )
    # 31-bit fields have no published Anemoi analysis: defaults refuse
    with pytest.raises(ValueError, match="pass rounds"):
        generate_anemoi_parameters(M31, 8, capacity=8)
    # every tier skips the 1x1 multiply at l = 1, so a non-identity matrix
    # (which the oracle WOULD apply) is rejected rather than diverging
    with pytest.raises(ValueError, match="identity at l = 1"):
        AnemoiConfig(
            field=FR, rounds=25, alpha=5, g=7, mat_x=((2,),),
            rc_x=CFG.rc_x, rc_y=CFG.rc_y, rate=1, capacity=1,
        )


def test_flystel_is_invertible():
    """The open Flystel is a 3-step butterfly of translations, inverted by
    replaying the steps backwards — checked concretely on random pairs."""
    for cfg, seed in ((CFG, 3), (get_default_anemoi_parameters(GL, 4), 4)):
        p = cfg.field.modulus
        o = OracleAnemoiSponge(cfg)
        for k in range(4):
            x, y = rand_fr(cfg.field, 2, seed=10 * seed + k)
            w, v = o._flystel(x, y)
            u = (w - cfg.g * v * v) % p
            yy = (v + pow(u, cfg.inv_alpha, p)) % p
            xx = (u + cfg.g * yy * yy + cfg.g_inv) % p
            assert (xx, yy) == (x, y)


def test_oracle_golden_regression():
    o = OracleAnemoiSponge(CFG)
    o.absorb_field_elements([0])
    assert o.squeeze_native_field_elements(2) == [
        35675714314881219429352217523578393221143023524104408084397769653631559795453,
        29250560957318018735580408678162621932017287796996990149206325536109642299737,
    ]
    gl_cfg = get_default_anemoi_parameters(GL, 4)
    o = OracleAnemoiSponge(gl_cfg)
    o.absorb_field_elements(list(range(4)))
    assert o.squeeze_native_field_elements(2) == [
        8816711172724677702, 3319201661018352774,
    ]


def test_xla_tier_vs_oracle():
    for fs, rate in ((FR, 1), (FR, 3), (GL, 4)):
        cfg = get_default_anemoi_parameters(fs, rate)
        B = 4
        vals = [rand_fr(fs, B, seed=11 + i) for i in range(cfg.t)]
        state = jnp.asarray(
            np.stack([fs.ints_to_mont_plane(row) for row in vals], axis=0)
        )
        out = np.asarray(anemoi_permute_jit(cfg)(state))
        for b in range(B):
            o = OracleAnemoiSponge(cfg)
            o.state = [vals[i][b] for i in range(cfg.t)]
            o.permute()
            got = [fs.mont_limbs_to_int(out[i][:, b]) for i in range(cfg.t)]
            assert got == o.state, (fs.name, rate, b)


def test_xla_tier_small_field_explicit_rounds():
    """31-bit fields run with explicit round counts; the value-safe fold
    discipline keeps the tier exact at the minimum R/p headroom (t=16 over
    Mersenne31)."""
    cfg = generate_anemoi_parameters(M31, 8, capacity=8, rounds=12)
    B = 4
    vals = [rand_fr(M31, B, seed=29 + i) for i in range(cfg.t)]
    state = jnp.asarray(
        np.stack([M31.ints_to_mont_plane(row) for row in vals], axis=0)
    )
    out = np.asarray(anemoi_permute_jit(cfg)(state))
    for b in range(B):
        o = OracleAnemoiSponge(cfg)
        o.state = [vals[i][b] for i in range(cfg.t)]
        o.permute()
        got = [M31.mont_limbs_to_int(out[i][:, b]) for i in range(cfg.t)]
        assert got == o.state, b


def test_duplex_sponge_integration():
    """The shared batched duplex sponge runs an AnemoiConfig unmodified via
    the batched_permute dispatch hook (same plug-in path as Poseidon2)."""
    from sponge_tpu import Batched
    from sponge_tpu.absorb import Fp
    from sponge_tpu.sponge import PoseidonSponge

    cfg = get_default_anemoi_parameters(FR, 3)
    B = 2
    lanes = [rand_fr(FR, 5, seed=50 + b) for b in range(B)]
    dev = PoseidonSponge(cfg, batch_size=B)
    dev.absorb(Batched([[Fp(v, FR) for v in vals] for vals in lanes]))
    got_elems = dev.squeeze_native_field_elements(3)
    got_bytes = dev.squeeze_bytes(17)
    for b in range(B):
        o = OracleAnemoiSponge(cfg)
        o.absorb_field_elements(lanes[b])
        assert got_elems[b] == o.squeeze_native_field_elements(3), b
        assert got_bytes[b] == o.squeeze_bytes(17), b


def test_oracle_duplex_is_poseidon_machine():
    """Anemoi's duplex behavior (lazy permutes, mode flips, additive absorb)
    is byte-identical to the shared machine — only permute() differs."""
    o = OracleAnemoiSponge(CFG)
    assert isinstance(o, OraclePoseidonSponge)
    o.absorb_field_elements([5])
    st = o.into_state()
    o2 = OracleAnemoiSponge.from_state(st, CFG)
    assert o2.squeeze_native_field_elements(1) == o.squeeze_native_field_elements(1)


def test_sharded_permute_matches_local():
    """Anemoi through shard_map (8-device CPU mesh) == the local XLA tier
    (VERDICT r2 item 6: Anemoi crossing shard_map)."""
    import jax

    from sponge_tpu import GOLDILOCKS_FR
    from sponge_tpu.parallel import make_mesh, sharded_permute_fn
    from sponge_tpu.poseidon.permutation import batched_permute

    fs = GOLDILOCKS_FR
    cfg = get_default_anemoi_parameters(fs, 4)
    B = 32
    vals = [rand_fr(fs, B, seed=70 + i) for i in range(cfg.t)]
    plane = np.stack([fs.ints_to_mont_plane(row) for row in vals], axis=0)
    mesh = make_mesh(8)
    state = jax.device_put(
        jnp.asarray(plane),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, None, "data")
        ),
    )
    out_sharded = np.asarray(sharded_permute_fn(cfg, mesh)(state))
    out_local = np.asarray(batched_permute(cfg, jnp.asarray(plane)))
    assert np.array_equal(out_sharded, out_local)


# ---- fused Pallas kernel body (ops/pallas_anemoi.py) ----

def _tiny_headroom_anemoi_config(rate=3, rounds=4):
    """Anemoi config over a 25-bit, 3-limb field (R/p headroom 2^11): wide
    enough for the kernel's value fixpoint (PHT adds + l-term diffusion sums
    amplify values between the contracting products)."""
    from sponge_tpu.fields import FieldSpec

    fs = FieldSpec(name="tiny_fr_25", modulus=(1 << 25) - 39, generator=3)
    return generate_anemoi_parameters(fs, rate, rounds=rounds)


@pytest.mark.parametrize("relaxed", [False, True], ids=["exact", "relaxed"])
@pytest.mark.parametrize("lane_streams", [1, 2], ids=["1stream", "2streams"])
def test_anemoi_kernel_body_vs_oracle(lane_streams, relaxed):
    """The fused kernel body (mock refs, CPU) == the scalar oracle: the
    l*ns-chain run-length ladder, negated-constant subtractions, rotated
    diffusion + PHT, exit canonicalization.  rate=3 makes l=2 (real rotation
    and a 2x2 diffusion matrix)."""
    import jax

    from test_pallas_kernels import _FakeRef
    from sponge_tpu.ops import pallas_anemoi as pa
    from sponge_tpu.ops.pallas_rescue import _exponent_runs

    cfg = _tiny_headroom_anemoi_config()
    pa._check_kernel_value_bounds(cfg)
    fs = cfg.field
    t, L, B = cfg.t, fs.nlimbs, 256
    vals = [rand_fr(fs, B, seed=101 + i) for i in range(t)]
    st4 = jnp.asarray(
        np.stack([fs.ints_to_mont_plane(row) for row in vals], axis=0)
    ).reshape(t, L, B // 128, 128)
    rc_np = np.stack(
        [
            np.concatenate(
                [fs.int_to_mont_limbs(c) for c in rx]
                + [fs.int_to_mont_limbs(c) for c in ry]
            )
            for rx, ry in zip(cfg.rc_x, cfg.rc_y)
        ]
    ).astype(np.int32)
    runs, _ = _exponent_runs(cfg.inv_alpha)
    runs_np = np.asarray(runs, dtype=np.int32)

    @jax.jit
    def run(rc, runs_arr, st):
        out_ref = _FakeRef(jnp.zeros_like(st))
        pa._anemoi_kernel(
            _FakeRef(rc), _FakeRef(runs_arr), _FakeRef(st), out_ref,
            cfg=cfg, lane_streams=lane_streams, relaxed=relaxed,
        )
        return out_ref.arr

    out = np.asarray(run(rc_np, runs_np, st4)).reshape(t, L, B)
    for b in range(0, B, 61):
        o = OracleAnemoiSponge(cfg)
        o.state = [vals[i][b] for i in range(t)]
        o.permute()
        got = [fs.mont_limbs_to_int(out[i][:, b]) for i in range(t)]
        assert got == o.state, b
        for i in range(t):
            assert fs.limbs_to_int(out[i][:, b]) < 2 * fs.modulus
            assert all(int(v) < (1 << 12) for v in out[i][:, b])


@pytest.mark.parametrize("reduce_pht", [False, True], ids=["unreduced", "redpht"])
def test_anemoi_kernel_single_pair(reduce_pht):
    """l=1 (rate 1): identity diffusion matrix path, PHT-only mixing.

    The redpht cell exercises the post-PHT Montgomery-by-1 reduction that
    ``anemoi_permute_fn`` auto-enables when the unreduced value fixpoint
    diverges (the production t=2 Jive_2 width over 255-bit fields)."""
    import jax

    from test_pallas_kernels import _FakeRef
    from sponge_tpu.ops import pallas_anemoi as pa
    from sponge_tpu.ops.pallas_rescue import _exponent_runs

    cfg = _tiny_headroom_anemoi_config(rate=1)
    fs = cfg.field
    t, L, B = cfg.t, fs.nlimbs, 256
    vals = [rand_fr(fs, B, seed=111 + i) for i in range(t)]
    st4 = jnp.asarray(
        np.stack([fs.ints_to_mont_plane(row) for row in vals], axis=0)
    ).reshape(t, L, B // 128, 128)
    rc_np = np.stack(
        [
            np.concatenate(
                [fs.int_to_mont_limbs(c) for c in rx]
                + [fs.int_to_mont_limbs(c) for c in ry]
            )
            for rx, ry in zip(cfg.rc_x, cfg.rc_y)
        ]
    ).astype(np.int32)
    runs, _ = _exponent_runs(cfg.inv_alpha)
    runs_np = np.asarray(runs, dtype=np.int32)

    @jax.jit
    def run(rc, runs_arr, st):
        out_ref = _FakeRef(jnp.zeros_like(st))
        pa._anemoi_kernel(
            _FakeRef(rc), _FakeRef(runs_arr), _FakeRef(st), out_ref,
            cfg=cfg, lane_streams=2, relaxed=True, reduce_pht=reduce_pht,
        )
        return out_ref.arr

    out = np.asarray(run(rc_np, runs_np, st4)).reshape(t, L, B)
    for b in range(0, B, 61):
        o = OracleAnemoiSponge(cfg)
        o.state = [vals[i][b] for i in range(t)]
        o.permute()
        assert [fs.mont_limbs_to_int(out[i][:, b]) for i in range(t)] == o.state


def test_anemoi_kernel_pallas_call_interpret():
    """anemoi_permute_fn through pl.pallas_call in interpret mode."""
    from sponge_tpu.ops.pallas_anemoi import anemoi_permute_fn

    cfg = _tiny_headroom_anemoi_config(rounds=2)
    fs = cfg.field
    t, B = cfg.t, 2048
    vals = [rand_fr(fs, B, seed=121 + i) for i in range(t)]
    state = jnp.asarray(
        np.stack([fs.ints_to_mont_plane(row) for row in vals], axis=0)
    )
    out = np.asarray(anemoi_permute_fn(cfg, interpret=True)(state))
    for b in range(0, B, 511):
        o = OracleAnemoiSponge(cfg)
        o.state = [vals[i][b] for i in range(t)]
        o.permute()
        assert [fs.mont_limbs_to_int(out[i][:, b]) for i in range(t)] == o.state


def test_anemoi_kernel_value_gate():
    """The static value-bound check admits the shipped 255-bit / Goldilocks
    defaults and the tiny-headroom CI field; the l=1 Jive_2 width diverges
    unreduced (identity diffusion: no REDC between the PHT adds) and is
    admitted by the post-PHT-reduction schedule."""
    from sponge_tpu.ops.pallas_anemoi import _check_kernel_value_bounds

    for shipped in (
        get_default_anemoi_parameters(FR, 3),
        get_default_anemoi_parameters(GL, 4),
        _tiny_headroom_anemoi_config(),
    ):
        _check_kernel_value_bounds(shipped)

    jive_width = get_default_anemoi_parameters(FR, 1)  # t = 2, l = 1
    with pytest.raises(ValueError):
        _check_kernel_value_bounds(jive_width, False)
    _check_kernel_value_bounds(jive_width, True)
