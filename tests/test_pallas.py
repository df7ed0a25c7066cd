"""Fused Pallas coupling kernels vs the pure-jnp oracle.

Runs the kernels in interpreter mode on CPU (SURVEY.md §7: "A pure-jnp
reference implementation stays alongside as the correctness oracle");
checks forward/inverse values, the ldj, the full custom-VJP gradients
(the reference's hand-written rrule algebra, RNVP.jl:99-147), and
roundtrip invertibility through the fused path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import densityflows_tpu as df
from densityflows_tpu.models import layers as L
from densityflows_tpu.ops.pallas_coupling import fused_coupling


@pytest.fixture(autouse=True)
def force_fused():
    L.set_fused_kernels(True)
    yield
    L.set_fused_kernels("auto")


def _make_layer(kind, d=5, n=1, mask=(0, 1, 2), hidden=16, key=0,
                activation="relu", bias=True):
    return df.coupling_layer(
        d, list(mask), n=n, kind=kind, key=jax.random.key(key),
        hidden_dim_s=hidden, hidden_dim_t=hidden,
        activation_s=activation, activation_t=activation, bias=bias,
    )


def _rand(key, *shape):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


@pytest.mark.parametrize("kind", [df.RNVPCouplingLayer, df.NICECouplingLayer])
@pytest.mark.parametrize("direction", ["forward", "inverse"])
def test_fused_matches_oracle(kind, direction):
    layer = _make_layer(kind)
    x = _rand(1, 37, 5)  # non-multiple of the tile to exercise padding
    theta = jax.random.uniform(jax.random.key(2), (37, 1))

    L.set_fused_kernels(False)
    ref = getattr(layer, direction)(x, theta)
    L.set_fused_kernels(True)
    out = getattr(layer, direction)(x, theta)

    np.testing.assert_allclose(out[0], ref[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[1], ref[1], rtol=1e-5, atol=1e-5)


def test_fused_sample_path_matches_oracle():
    layer = _make_layer(df.RNVPCouplingLayer)
    z = _rand(3, 20, 5)
    theta = jax.random.uniform(jax.random.key(4), (20, 1))
    L.set_fused_kernels(False)
    ref = layer.forward_(z, theta)
    L.set_fused_kernels(True)
    out = layer.forward_(z, theta)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("activation", ["relu", "tanh", "gelu", "silu"])
def test_fused_gradients_match_oracle(activation):
    """Full custom-VJP check: d(loss)/d(params, x, θ) vs jax.grad of the
    jnp oracle — the fused analogue of the reference rrule algebra
    (RNVP.jl:119-143, including the g_ldj coupling into ds)."""
    layer = _make_layer(df.RNVPCouplingLayer, activation=activation)
    x = _rand(5, 23, 5)
    theta = jax.random.uniform(jax.random.key(6), (23, 1))

    def loss(layer, x, theta):
        z, ldj = layer.inverse(x, theta)
        return jnp.sum(z * z) - 2.0 * jnp.sum(ldj)

    L.set_fused_kernels(False)
    ref = jax.grad(loss, argnums=(0, 1, 2))(layer, x, theta)
    L.set_fused_kernels(True)
    out = jax.grad(loss, argnums=(0, 1, 2))(layer, x, theta)

    flat_ref, _ = jax.tree_util.tree_flatten(ref)
    flat_out, _ = jax.tree_util.tree_flatten(out)
    assert len(flat_ref) == len(flat_out)
    for a, b in zip(flat_out, flat_ref):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_fused_gradients_forward_direction():
    layer = _make_layer(df.RNVPCouplingLayer)
    z = _rand(7, 16, 5)
    theta = jax.random.uniform(jax.random.key(8), (16, 1))

    def loss(layer, z, theta):
        x, ldj = layer.forward(z, theta)
        return jnp.sum(jnp.sin(x)) + jnp.sum(ldj * ldj)

    L.set_fused_kernels(False)
    ref = jax.grad(loss, argnums=(0, 1, 2))(layer, z, theta)
    L.set_fused_kernels(True)
    out = jax.grad(loss, argnums=(0, 1, 2))(layer, z, theta)
    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_fused_gradients_nice():
    layer = _make_layer(df.NICECouplingLayer)
    x = _rand(9, 19, 5)
    theta = jax.random.uniform(jax.random.key(10), (19, 1))

    def loss(layer, x, theta):
        z, ldj = layer.inverse(x, theta)
        return jnp.sum(z**2) + jnp.sum(ldj)

    L.set_fused_kernels(False)
    ref = jax.grad(loss, argnums=(0, 1, 2))(layer, x, theta)
    L.set_fused_kernels(True)
    out = jax.grad(loss, argnums=(0, 1, 2))(layer, x, theta)
    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_fused_no_bias():
    layer = _make_layer(df.RNVPCouplingLayer, bias=False)
    x = _rand(11, 12, 5)
    theta = jax.random.uniform(jax.random.key(12), (12, 1))

    def loss(layer, x, theta):
        z, ldj = layer.inverse(x, theta)
        return jnp.sum(z) + jnp.sum(ldj)

    L.set_fused_kernels(False)
    val_ref = loss(layer, x, theta)
    ref = jax.grad(loss)(layer, x, theta)
    L.set_fused_kernels(True)
    val = loss(layer, x, theta)
    out = jax.grad(loss)(layer, x, theta)
    np.testing.assert_allclose(val, val_ref, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_fused_roundtrip_invertibility():
    """forward∘inverse = id and ldj_f + ldj_b ≈ 0 through the fused path
    (reference invariant, test/runtests.jl:50-62)."""
    layer = _make_layer(df.RNVPCouplingLayer, mask=(1, 3))
    x = _rand(13, 40, 5)
    theta = jax.random.uniform(jax.random.key(14), (40, 1))
    z, ldj_b = layer.inverse(x, theta)
    x2, ldj_f = layer.forward(z, theta)
    np.testing.assert_allclose(x2, x, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ldj_f + ldj_b, np.zeros_like(ldj_f), atol=1e-5)


def test_fused_in_train_step():
    """The fused kernels compose with the whole jitted train step."""
    import optax

    rng = np.random.default_rng(0)
    x = rng.normal(size=(256, 5)).astype(np.float32)
    theta = rng.uniform(0, 1, size=(256, 1)).astype(np.float32)
    data = df.DataArrays.make(x, theta, rng=0)
    chain = df.flow_chain(
        df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                          hidden_dim_s=16, hidden_dim_t=16),
        df.coupling_layer(data, [2, 3, 4], key=jax.random.key(1),
                          hidden_dim_s=16, hidden_dim_t=16),
        df.normalization_layer(x, -1.0, 1.0),
    )
    flow = df.Flow(chain, data)
    df.train(flow, data, epochs=2, verbose=False, key=jax.random.key(3))
    assert len(flow.train_loss) == 2
    assert np.all(np.isfinite(flow.train_loss))


def test_fused_grads_kernel_matches_jax_grad():
    """ops/pallas_step.run_fused_grads (the shard_map-composable
    grads-only step kernel, r5) == jax.value_and_grad of
    masked_nll_loss through the fold/unfold embedding — including
    batch tiling, padded-row masks, and a clamped joint layer."""
    import jax.numpy as jnp

    import densityflows_tpu as df
    from densityflows_tpu.models.fused_train import chain_train_fold
    from densityflows_tpu.ops.pallas_step import run_fused_grads
    from densityflows_tpu.train import masked_nll_loss

    rng = np.random.default_rng(1)
    x = rng.normal(size=(100, 5)).astype(np.float32)
    th = rng.uniform(-1, 2, size=(100, 1)).astype(np.float32)
    data = df.DataArrays.make(x, th, rng=0)
    chain = df.flow_chain(
        df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                          hidden_dim_s=8, hidden_dim_t=8),
        df.coupling_layer(data, [2, 3, 4], key=jax.random.key(1),
                          joint_conditioner=True, hidden_dim_s=8,
                          hidden_dim_t=8, max_log_scale=3.0),
        df.normalization_layer(x, -1.0, 1.0),
    )
    flow = df.Flow(chain, data)
    xb, thb = data.normalized_training_data(flow.metadata)
    xb, thb = jnp.asarray(xb[:64]), jnp.asarray(thb[:64])
    mask = jnp.concatenate([jnp.ones(50), jnp.zeros(14)]).astype(jnp.float32)

    (plan, tcounts, tparams, masks, mask_slots, cparams, _fs,
     unfold) = chain_train_fold(chain)
    loss_k, grads_k = run_fused_grads(
        xb, thb, mask, tuple(tparams), tuple(masks), tuple(cparams),
        plan=plan, tcounts=tuple(tcounts), mask_slots=tuple(mask_slots),
        tile=32)
    loss_j, grads_j = jax.value_and_grad(masked_nll_loss)(
        chain, flow.base, xb, thb, mask)
    assert abs(float(loss_k) - float(loss_j)) < 1e-5

    def zero_tpl():
        return jax.tree_util.tree_map(jnp.zeros_like, chain)

    g_unfold = unfold(list(grads_k), zero_tpl())
    for a, b in zip(jax.tree_util.tree_leaves(g_unfold),
                    jax.tree_util.tree_leaves(grads_j)):
        if a.size:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)
