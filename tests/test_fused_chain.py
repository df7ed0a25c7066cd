"""Whole-chain fused Pallas kernel vs the per-layer jnp oracle.

Exercises ``models/fused_chain.py`` + ``ops/pallas_chain.py`` in
interpreter mode on CPU: value/ldj parity for forward/inverse/sampling
folds over a mixed chain (couplings, blocks, normalization, actnorm,
permutation, LU-linear, logit), gradient parity through the custom-VJP
fallback, unsupported-chain refusal, and unconditional (zero-width θ)
chains.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import densityflows_tpu as df
from densityflows_tpu.models import layers as L
from densityflows_tpu.models.fused_chain import maybe_apply_fused


@pytest.fixture(autouse=True)
def force_fused():
    L.set_fused_kernels(True)
    yield
    L.set_fused_kernels("auto")


def _mixed_chain(d=6, n=2, key=0):
    ks = jax.random.split(jax.random.key(key), 4)
    rng = np.random.default_rng(0)
    x_ref = rng.normal(size=(64, d)).astype(np.float32) * 2.0 + 0.5
    return df.flow_chain(
        df.coupling_layer(d, [0, 1, 2], n=n, key=ks[0], hidden_dim_s=16,
                          hidden_dim_t=16, zero_init_final=False),
        df.actnorm_layer(x_ref),
        df.coupling_block(d, None, n=n, key=ks[1], hidden_dim_s=16,
                          hidden_dim_t=16, zero_init_final=False),
        df.permutation_layer(d, key=ks[2]),
        df.coupling_layer(d, [d - 3, d - 2, d - 1], n=n,
                          kind=df.NICECouplingLayer,
                          key=ks[3], hidden_dim_t=16, zero_init_final=False),
        df.invertible_linear_layer(d, key=ks[2]),
        df.normalization_layer(x_ref, -1.0, 1.0),
    )


def _inputs(d=6, n=2, rows=37, key=5):
    x = jax.random.normal(jax.random.key(key), (rows, d), jnp.float32) * 0.5
    theta = jax.random.uniform(jax.random.key(key + 1), (rows, n))
    return x, theta


def _jnp_fold(chain, y, theta, dirn):
    L.set_fused_kernels(False)
    try:
        if dirn == "fwd":
            out = chain.forward(y, theta)
        else:
            out = chain.inverse(y, theta)
    finally:
        L.set_fused_kernels(True)
    return out


@pytest.mark.parametrize("dirn", ["fwd", "inv"])
def test_chain_matches_oracle(dirn):
    chain = _mixed_chain()
    x, theta = _inputs()
    out = maybe_apply_fused(chain, x, theta, dirn, True)
    assert out is not None, "mixed affine chain should be fusable"
    ref = _jnp_fold(chain, x, theta, dirn)
    np.testing.assert_allclose(out[0], ref[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(out[1], ref[1], rtol=2e-5, atol=2e-5)


def test_sampling_fold_matches_oracle():
    chain = _mixed_chain()
    z, theta = _inputs(key=9)
    fused = chain.forward_(z, theta)  # routed through the fused chain
    L.set_fused_kernels(False)
    ref = chain.forward_(z, theta)
    L.set_fused_kernels(True)
    np.testing.assert_allclose(fused, ref, rtol=2e-5, atol=2e-5)


def test_logit_tail_matches_oracle():
    d, n = 4, 1
    lo = np.zeros(d, np.float32)
    hi = np.ones(d, np.float32) * 3.0
    chain = df.flow_chain(
        df.coupling_layer(d, [0, 1], n=n, key=jax.random.key(0),
                          hidden_dim_s=8, hidden_dim_t=8,
                          zero_init_final=False),
        df.logit_layer((lo, hi)),
    )
    z, theta = _inputs(d=d, n=n, rows=21, key=3)
    out = maybe_apply_fused(chain, z, theta, "fwd", True)
    ref = _jnp_fold(chain, z, theta, "fwd")
    np.testing.assert_allclose(out[0], ref[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(out[1], ref[1], rtol=2e-5, atol=2e-5)
    # inverse direction: data inside the box
    x = np.asarray(out[0])
    out_i = maybe_apply_fused(chain, jnp.asarray(x), theta, "inv", True)
    ref_i = _jnp_fold(chain, jnp.asarray(x), theta, "inv")
    np.testing.assert_allclose(out_i[0], ref_i[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(out_i[1], ref_i[1], rtol=2e-5, atol=2e-5)


def test_roundtrip_through_fused_chain():
    chain = _mixed_chain()
    z, theta = _inputs(key=11)
    x, ldj_f = maybe_apply_fused(chain, z, theta, "fwd", True)
    z2, ldj_b = maybe_apply_fused(chain, x, theta, "inv", True)
    np.testing.assert_allclose(z2, z, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ldj_f + ldj_b, np.zeros(len(z)), atol=1e-4)


def test_gradients_fall_back_to_oracle():
    chain = _mixed_chain(d=4, n=1, key=2)
    x, theta = _inputs(d=4, n=1, rows=16, key=7)

    def loss_fused(c, xx, tt):
        z, ldj = maybe_apply_fused(c, xx, tt, "inv", True)
        return jnp.sum(z**2) - jnp.sum(ldj)

    def loss_ref(c, xx, tt):
        z, ldj = _jnp_fold(c, xx, tt, "inv")
        return jnp.sum(z**2) - jnp.sum(ldj)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(chain, x, theta)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(chain, x, theta)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_unconditional_chain():
    d = 5
    chain = df.flow_chain(
        df.coupling_layer(d, [0, 1, 2], n=0, key=jax.random.key(1),
                          hidden_dim_s=8, hidden_dim_t=8,
                          zero_init_final=False),
        df.coupling_layer(d, [2, 3, 4], n=0, key=jax.random.key(2),
                          hidden_dim_s=8, hidden_dim_t=8,
                          zero_init_final=False),
    )
    x = jax.random.normal(jax.random.key(3), (19, d), jnp.float32)
    theta = jnp.zeros((19, 0), jnp.float32)
    out = maybe_apply_fused(chain, x, theta, "inv", True)
    assert out is not None
    ref = _jnp_fold(chain, x, theta, "inv")
    np.testing.assert_allclose(out[0], ref[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(out[1], ref[1], rtol=2e-5, atol=2e-5)


def test_unsupported_chain_returns_none():
    d, n = 4, 1
    chain = df.flow_chain(
        df.coupling_layer(d, [0, 1], n=n, kind=df.RQSCouplingLayer,
                          key=jax.random.key(0)),
    )
    x, theta = _inputs(d=d, n=n, rows=8, key=1)
    assert maybe_apply_fused(chain, x, theta, "fwd", True) is None


def test_flow_entry_points_use_fused_path(fixture_data):
    """End-to-end: Flow.log_prob / sample agree between fused & jnp."""
    x_np, th_np = fixture_data
    data = df.DataArrays.make(x_np, th_np, rng=0)
    ks = jax.random.split(jax.random.key(0), 2)
    chain = df.flow_chain(
        df.coupling_layer(data, [0, 1, 2], key=ks[0], hidden_dim_s=8,
                          hidden_dim_t=8, zero_init_final=False),
        df.coupling_layer(data, [2, 3, 4], key=ks[1], hidden_dim_s=8,
                          hidden_dim_t=8, zero_init_final=False),
        df.normalization_layer(x_np, -1.0, 1.0),
    )
    flow = df.Flow(chain, data)
    lp_fused = flow.log_prob(x_np[:50], (-1.0,))
    s_fused = flow.sample((64,), (-1.0,), key=jax.random.key(5))
    L.set_fused_kernels(False)
    jax.clear_caches()
    lp_ref = flow.log_prob(x_np[:50], (-1.0,))
    s_ref = flow.sample((64,), (-1.0,), key=jax.random.key(5))
    L.set_fused_kernels(True)
    jax.clear_caches()
    np.testing.assert_allclose(lp_fused, lp_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(s_fused, s_ref, rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="in-kernel PRNG is a real-TPU-only path (the CPU interpreter "
           "stubs prng_random_bits to zeros); run on hardware via "
           "benchmarks/ or the TPU probe",
)
def test_fused_sampling_program_statistics():
    """In-kernel PRNG + Box–Muller: identity-at-init chain + trailing
    normalization ⇒ output is an affine map of N(0, I); check moments and
    per-key determinism."""
    from densityflows_tpu.models.fused_chain import maybe_sample_fused

    d, n = 4, 1
    rng = np.random.default_rng(0)
    x_ref = rng.normal(size=(256, d)).astype(np.float32)
    chain = df.flow_chain(
        df.coupling_layer(d, [0, 1], n=n, key=jax.random.key(0),
                          hidden_dim_s=8, hidden_dim_t=8),  # identity at init
        df.normalization_layer(x_ref, -1.0, 1.0),
    )
    rows = 1 << 14
    theta_n = jnp.full((1, n), 0.5, jnp.float32)
    out = maybe_sample_fused(chain, jax.random.key(7), rows, d, theta_n)
    assert out is not None and out.shape == (rows, d)
    out2 = maybe_sample_fused(chain, jax.random.key(7), rows, d, theta_n)
    np.testing.assert_array_equal(out, out2)  # deterministic per key
    out3 = maybe_sample_fused(chain, jax.random.key(8), rows, d, theta_n)
    assert not np.allclose(out, out3)

    # invert the trailing normalization analytically: z = N(0,1) expected
    norm = chain.layers[-1]
    z, _ = norm.inverse(out)
    z = np.asarray(z)
    assert np.all(np.abs(z.mean(axis=0)) < 0.05)
    assert np.all(np.abs(z.std(axis=0) - 1.0) < 0.05)
    assert np.all(np.abs(z) < 6.5)  # 24-bit-uniform tail cap ≈ 5.8σ


def test_flow_sample_fused_matches_flow_contract(fixture_data):
    """Flow.sample routes through the fused sampler and keeps the API
    contract (shape, θ broadcast, dims tuple)."""
    x_np, th_np = fixture_data
    data = df.DataArrays.make(x_np, th_np, rng=0)
    chain = df.flow_chain(
        df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                          hidden_dim_s=8, hidden_dim_t=8),
        df.normalization_layer(x_np, -1.0, 1.0),
    )
    flow = df.Flow(chain, data)
    s = flow.sample((2, 5, 7), (-1.0,), key=jax.random.key(1))
    assert s.shape == (2, 5, 7, 5)
    assert np.all(np.isfinite(s))
    # per-row θ array path
    th = np.full((64, 1), 2.0, np.float32)
    s2 = flow.sample((64,), th, key=jax.random.key(2))
    assert s2.shape == (64, 5)
    assert np.all(np.isfinite(s2))


def test_clamped_chain_matches_oracle():
    """max_log_scale tanh-clamped couplings route through the whole-chain
    kernel since r4; parity vs the jnp fold in both directions (clamps
    low enough that the nonlinear region is exercised)."""
    from densityflows_tpu.models.fused_chain import _jnp_chain

    d, n = 6, 2
    ks = jax.random.split(jax.random.key(3), 3)
    chain = df.flow_chain(
        df.coupling_layer(d, [0, 1, 2], n=n, key=ks[0], hidden_dim_s=16,
                          hidden_dim_t=16, zero_init_final=False,
                          max_log_scale=0.2),
        df.coupling_layer(d, [3, 4, 5], n=n, key=ks[1],
                          joint_conditioner=True, hidden_dim_s=16,
                          hidden_dim_t=16, zero_init_final=False,
                          max_log_scale=0.5),
    )
    x, theta = _inputs(d, n)
    for dirn in ("fwd", "inv"):
        out = maybe_apply_fused(chain, x, theta, dirn, True)
        assert out is not None, "clamped chain did not route"
        y_f, ldj_f = out
        y_o, ldj_o = _jnp_chain(chain, x, theta, dirn, True)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_o),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(ldj_f), np.asarray(ldj_o),
                                   atol=2e-5)
