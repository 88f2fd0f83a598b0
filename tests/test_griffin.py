"""Griffin-pi family: structure, oracle golden regression, XLA tier vs
oracle, permutation-property (invertibility) check, duplex integration.

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
from sponge_tpu.griffin import (
    GriffinConfig,
    OracleGriffinSponge,
    generate_griffin_parameters,
    get_default_griffin_parameters,
    griffin_default_rounds,
    is_quadratic_nonresidue,
)
from sponge_tpu.griffin.permutation import griffin_permute_jit
from sponge_tpu.poseidon.oracle import OraclePoseidonSponge

CFG = get_default_griffin_parameters(FR, 2)


def rand_fr(fs, n, seed=7):
    rng = np.random.default_rng(seed)
    return [int(v) % fs.modulus for v in rng.integers(0, 1 << 62, size=n)]


def test_structure_and_defaults():
    assert CFG.t == 3 and CFG.alpha == 5 and CFG.rounds == 14
    assert CFG.alpha * CFG.inv_alpha % (FR.modulus - 1) == 1
    # quadratic discriminants are non-residues for EVERY element index
    cfg8 = get_default_griffin_parameters(GL, 4)
    assert cfg8.t == 8 and cfg8.alpha == 7 and cfg8.rounds == 12
    for i in range(2, cfg8.t):
        a_i, b_i = cfg8.quad_coeffs(i)
        assert is_quadratic_nonresidue(
            (a_i * a_i - 4 * b_i) % GL.modulus, GL.modulus
        ), i
    assert griffin_default_rounds(3) == 16
    # linear layer is the Poseidon2 small-int family
    assert CFG.mat_e == ((2, 1, 1), (1, 2, 1), (1, 1, 2))


def test_config_validation():
    with pytest.raises(ValueError, match="t % 4 == 0"):
        generate_griffin_parameters(FR, 4, capacity=1)  # t = 5
    with pytest.raises(ValueError, match="width must be 3 or a multiple"):
        GriffinConfig(
            field=FR, rounds=2, alpha=5, mat_e=((2, 1), (1, 2)),
            rc=(CFG.rc[0][:2],), qc_alpha=CFG.qc_alpha,
            qc_beta=CFG.qc_beta, rate=1, capacity=1,
        )  # t = 2: valid Poseidon2 width, too narrow for Griffin
    with pytest.raises(ValueError, match="not invertible"):
        GriffinConfig(
            field=FR, rounds=2, alpha=3, mat_e=CFG.mat_e, rc=CFG.rc[:1],
            qc_alpha=CFG.qc_alpha, qc_beta=CFG.qc_beta, rate=2, capacity=1,
        )
    with pytest.raises(ValueError, match="rc must have"):
        GriffinConfig(
            field=FR, rounds=3, alpha=5, mat_e=CFG.mat_e, rc=CFG.rc[:1],
            qc_alpha=CFG.qc_alpha, qc_beta=CFG.qc_beta, rate=2, capacity=1,
        )
    # a perfect-square discriminant must be rejected: a=2, b=0 -> disc=4
    with pytest.raises(ValueError, match="non-residue"):
        GriffinConfig(
            field=FR, rounds=14, alpha=5, mat_e=CFG.mat_e, rc=CFG.rc,
            qc_alpha=2, qc_beta=0, rate=2, capacity=1,
        )
    # 31-bit fields have no published Griffin analysis: defaults refuse
    with pytest.raises(ValueError, match="pass rounds"):
        generate_griffin_parameters(M31, 8, capacity=8)


def test_nonlinear_layer_is_invertible():
    """The permutation property argued in griffin/config.py, checked
    concretely: invert S sequentially (y0^d, y1^(1/d), then divide by the
    quadratic gate in index order) and roundtrip random states."""
    for cfg, seed in ((CFG, 3), (get_default_griffin_parameters(GL, 4), 4)):
        p = cfg.field.modulus
        o = OracleGriffinSponge(cfg)
        x = rand_fr(cfg.field, cfg.t, seed=seed)
        y = list(x)
        o._nonlinear(y)
        # invert
        back = [pow(y[0], cfg.alpha, p), pow(y[1], cfg.inv_alpha, p)]
        for i in range(2, cfg.t):
            li = ((i - 1) * y[0] + y[1] + (back[i - 1] if i >= 3 else 0)) % p
            a_i, b_i = cfg.quad_coeffs(i)
            quad = (li * li + a_i * li + b_i) % p
            back.append(y[i] * pow(quad, -1, p) % p)
        assert back == x


def test_oracle_golden_regression():
    o = OracleGriffinSponge(CFG)
    o.absorb_field_elements([0, 1])
    assert o.squeeze_native_field_elements(2) == [
        17568489372357836836505885331655087491470577238226034896877593231157640869808,
        14593224294559100415741393686604387315592950665506024215387915292647432429441,
    ]
    gl_cfg = get_default_griffin_parameters(GL, 4)
    o = OracleGriffinSponge(gl_cfg)
    o.absorb_field_elements(list(range(4)))
    assert o.squeeze_native_field_elements(2) == [
        5142094782954152270, 13580507934772854974,
    ]


def test_xla_tier_vs_oracle():
    for fs, rate in ((FR, 2), (GL, 4)):
        cfg = get_default_griffin_parameters(fs, rate)
        B = 4
        vals = [rand_fr(fs, B, seed=11 + i) for i in range(cfg.t)]
        state = jnp.asarray(
            np.stack([fs.ints_to_mont_plane(row) for row in vals], axis=0)
        )
        out = np.asarray(griffin_permute_jit(cfg)(state))
        for b in range(B):
            o = OracleGriffinSponge(cfg)
            o.state = [vals[i][b] for i in range(cfg.t)]
            o.permute()
            got = [fs.mont_limbs_to_int(out[i][:, b]) for i in range(cfg.t)]
            assert got == o.state, (fs.name, b)


def test_xla_tier_small_field_explicit_rounds():
    """31-bit fields run with explicit round counts; the value-safe fold
    discipline keeps the tier exact at the minimum R/p headroom (t=16 over
    Mersenne31: un-reduced row sums far exceed R without folding)."""
    cfg = generate_griffin_parameters(M31, 8, capacity=8, rounds=10)
    B = 4
    vals = [rand_fr(M31, B, seed=29 + i) for i in range(cfg.t)]
    state = jnp.asarray(
        np.stack([M31.ints_to_mont_plane(row) for row in vals], axis=0)
    )
    out = np.asarray(griffin_permute_jit(cfg)(state))
    for b in range(B):
        o = OracleGriffinSponge(cfg)
        o.state = [vals[i][b] for i in range(cfg.t)]
        o.permute()
        got = [M31.mont_limbs_to_int(out[i][:, b]) for i in range(cfg.t)]
        assert got == o.state, b


def test_duplex_sponge_integration():
    """The shared batched duplex sponge runs a GriffinConfig unmodified via
    the batched_permute dispatch hook (same plug-in path as Poseidon2)."""
    from sponge_tpu import Batched
    from sponge_tpu.absorb import Fp
    from sponge_tpu.sponge import PoseidonSponge

    B = 2
    lanes = [rand_fr(FR, 5, seed=50 + b) for b in range(B)]
    dev = PoseidonSponge(CFG, batch_size=B)
    dev.absorb(Batched([[Fp(v, FR) for v in vals] for vals in lanes]))
    got_elems = dev.squeeze_native_field_elements(3)
    got_bytes = dev.squeeze_bytes(17)
    for b in range(B):
        o = OracleGriffinSponge(CFG)
        o.absorb_field_elements(lanes[b])
        assert got_elems[b] == o.squeeze_native_field_elements(3), b
        assert got_bytes[b] == o.squeeze_bytes(17), b


def test_oracle_duplex_is_poseidon_machine():
    """Griffin's duplex behavior (lazy permutes, mode flips, additive absorb)
    is byte-identical to the shared machine — only permute() differs."""
    o = OracleGriffinSponge(CFG)
    assert isinstance(o, OraclePoseidonSponge)
    o.absorb_field_elements([5])
    st = o.into_state()
    o2 = OracleGriffinSponge.from_state(st, CFG)
    assert o2.squeeze_native_field_elements(1) == o.squeeze_native_field_elements(1)


# ---- fused Pallas kernel body (ops/pallas_griffin.py) ----

def _tiny_headroom_griffin_config(rate=2, rounds=4):
    """Griffin config over a 25-bit, 3-limb field (R/p headroom 2^11): wide
    enough for the kernel's value fixpoint (the un-reduced small-int linear
    layer amplifies values by row_sum before each ladder)."""
    from sponge_tpu.fields import FieldSpec

    fs = FieldSpec(name="tiny_fr_25", modulus=(1 << 25) - 39, generator=3)
    return generate_griffin_parameters(fs, rate, rounds=rounds)


@pytest.mark.parametrize("relaxed", [False, True], ids=["exact", "relaxed"])
@pytest.mark.parametrize("lane_streams", [1, 2], ids=["1stream", "2streams"])
def test_griffin_kernel_body_vs_oracle(lane_streams, relaxed):
    """The fused kernel body (mock refs, CPU) == the scalar oracle: run-length
    inverse ladder, interleaved quadratic gates, un-reduced small-int linear
    layer, exit canonicalization."""
    import jax
    import jax.numpy as jnp

    from test_pallas_kernels import _FakeRef
    from sponge_tpu.ops import pallas_griffin as pg
    from sponge_tpu.ops.pallas_rescue import _exponent_runs

    cfg = _tiny_headroom_griffin_config()
    pg._check_kernel_value_bounds(cfg, False)
    fs = cfg.field
    t, L, B = cfg.t, fs.nlimbs, 256
    vals = [rand_fr(fs, B, seed=81 + i) for i in range(t)]
    st4 = jnp.asarray(
        np.stack([fs.ints_to_mont_plane(row) for row in vals], axis=0)
    ).reshape(t, L, B // 128, 128)
    zero_row = tuple(0 for _ in range(t))
    rc_np = np.stack(
        [
            np.concatenate([fs.int_to_mont_limbs(c) for c in row])
            for row in tuple(cfg.rc) + (zero_row,)
        ]
    ).astype(np.int32)
    runs, _ = _exponent_runs(cfg.inv_alpha)
    runs_np = np.asarray(runs, dtype=np.int32)

    @jax.jit
    def run(rc, runs_arr, st):
        out_ref = _FakeRef(jnp.zeros_like(st))
        pg._griffin_kernel(
            _FakeRef(rc), _FakeRef(runs_arr), _FakeRef(st), out_ref,
            cfg=cfg, lane_streams=lane_streams, relaxed=relaxed,
        )
        return out_ref.arr

    out = np.asarray(run(rc_np, runs_np, st4)).reshape(t, L, B)
    for b in range(0, B, 61):
        o = OracleGriffinSponge(cfg)
        o.state = [vals[i][b] for i in range(t)]
        o.permute()
        got = [fs.mont_limbs_to_int(out[i][:, b]) for i in range(t)]
        assert got == o.state, b
        for i in range(t):
            assert fs.limbs_to_int(out[i][:, b]) < 2 * fs.modulus
            assert all(int(v) < (1 << 12) for v in out[i][:, b])


def test_griffin_kernel_pallas_call_interpret():
    """griffin_permute_fn through pl.pallas_call in interpret mode (SMEM
    specs, grid tiling, run-length plumbing)."""
    import jax.numpy as jnp

    from sponge_tpu.ops.pallas_griffin import griffin_permute_fn

    cfg = _tiny_headroom_griffin_config(rounds=2)
    fs = cfg.field
    t, B = cfg.t, 2048
    vals = [rand_fr(fs, B, seed=91 + i) for i in range(t)]
    state = jnp.asarray(
        np.stack([fs.ints_to_mont_plane(row) for row in vals], axis=0)
    )
    out = np.asarray(griffin_permute_fn(cfg, interpret=True)(state))
    for b in range(0, B, 511):
        o = OracleGriffinSponge(cfg)
        o.state = [vals[i][b] for i in range(t)]
        o.permute()
        assert [fs.mont_limbs_to_int(out[i][:, b]) for i in range(t)] == o.state


def test_griffin_kernel_value_gate():
    """The unreduced fixpoint admits the 255-bit default but genuinely
    diverges for Goldilocks t=8 (row_sum 48 vs R/p = 256); the post-linear
    Montgomery-by-1 reduction closes it — griffin_permute_fn selects that
    automatically."""
    import pytest as _pytest

    from sponge_tpu.ops.pallas_griffin import _check_kernel_value_bounds

    _check_kernel_value_bounds(CFG, False)
    _check_kernel_value_bounds(_tiny_headroom_griffin_config(), False)
    gl = get_default_griffin_parameters(GL, 4)
    with _pytest.raises(ValueError, match="reaches R"):
        _check_kernel_value_bounds(gl, False)
    _check_kernel_value_bounds(gl, True)


def test_griffin_kernel_body_reduce_linear():
    """The post-linear reduction variant (the Goldilocks-t=8 schedule) is
    still oracle bit-exact."""
    import jax
    import jax.numpy as jnp

    from test_pallas_kernels import _FakeRef
    from sponge_tpu.ops import pallas_griffin as pg
    from sponge_tpu.ops.pallas_rescue import _exponent_runs

    cfg = _tiny_headroom_griffin_config()
    fs = cfg.field
    t, L, B = cfg.t, fs.nlimbs, 256
    vals = [rand_fr(fs, B, seed=85 + i) for i in range(t)]
    st4 = jnp.asarray(
        np.stack([fs.ints_to_mont_plane(row) for row in vals], axis=0)
    ).reshape(t, L, B // 128, 128)
    zero_row = tuple(0 for _ in range(t))
    rc_np = np.stack(
        [
            np.concatenate([fs.int_to_mont_limbs(c) for c in row])
            for row in tuple(cfg.rc) + (zero_row,)
        ]
    ).astype(np.int32)
    runs, _ = _exponent_runs(cfg.inv_alpha)
    runs_np = np.asarray(runs, dtype=np.int32)

    @jax.jit
    def run(rc, runs_arr, st):
        out_ref = _FakeRef(jnp.zeros_like(st))
        pg._griffin_kernel(
            _FakeRef(rc), _FakeRef(runs_arr), _FakeRef(st), out_ref,
            cfg=cfg, lane_streams=2, relaxed=True, reduce_linear=True,
        )
        return out_ref.arr

    out = np.asarray(run(rc_np, runs_np, st4)).reshape(t, L, B)
    for b in range(0, B, 61):
        o = OracleGriffinSponge(cfg)
        o.state = [vals[i][b] for i in range(t)]
        o.permute()
        assert [fs.mont_limbs_to_int(out[i][:, b]) for i in range(t)] == o.state
