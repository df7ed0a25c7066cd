"""Glow-family layer tests: ActNorm + LU-parameterized invertible linear."""

import numpy as np
import jax
import jax.numpy as jnp

import densityflows_tpu as df


def test_actnorm_data_init_whitens():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(4000, 3)) * np.array([2.0, 0.3, 5.0])
         + np.array([1.0, -4.0, 0.5])).astype(np.float32)
    layer = df.actnorm_layer(x)
    z, ldj = layer.inverse(jnp.asarray(x))
    z = np.asarray(z)
    np.testing.assert_allclose(z.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(z.std(axis=0), 1.0, atol=1e-3)
    assert ldj.shape == (4000,) and ldj.dtype == jnp.float32


def test_actnorm_roundtrip_and_ldj():
    rng = np.random.default_rng(1)
    layer = df.ActNormLayer(
        jnp.asarray(rng.normal(size=(4,)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(4,)).astype(np.float32)),
    )
    x = jnp.asarray(rng.normal(size=(7, 4)).astype(np.float32))
    z, ldj_b = layer.inverse(x)
    x2, ldj_f = layer.forward(z)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldj_f + ldj_b), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(layer.forward_(z)), np.asarray(x2), atol=0
    )
    # ldj matches autodiff jacobian
    J = jax.jacobian(lambda v: layer.inverse(v[None])[0][0])(x[0])
    _, logdet = np.linalg.slogdet(np.asarray(J))
    np.testing.assert_allclose(float(ldj_b[0]), logdet, rtol=1e-5)


def test_actnorm_identity_init_int():
    layer = df.actnorm_layer(5)
    x = jax.random.normal(jax.random.key(0), (6, 5))
    z, ldj = layer.inverse(x)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(ldj), 0.0)


def test_invertible_linear_init_is_rotation():
    """QR init => W orthogonal => ldj == 0 and z preserves norms."""
    layer = df.invertible_linear_layer(6, key=jax.random.key(2))
    x = jax.random.normal(jax.random.key(3), (11, 6))
    z, ldj = layer.inverse(x)
    np.testing.assert_allclose(np.asarray(ldj), 0.0, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(z), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


def test_invertible_linear_roundtrip_and_ldj_autodiff():
    layer = df.invertible_linear_layer(5, key=jax.random.key(4))
    # perturb off the orthogonal init so ldj is non-trivial
    leaves, treedef = jax.tree_util.tree_flatten(layer)
    rng = np.random.default_rng(5)
    leaves = [jnp.asarray(l) + 0.3 * jnp.asarray(rng.normal(size=l.shape), l.dtype)
              for l in leaves]
    layer = jax.tree_util.tree_unflatten(treedef, leaves)

    x = jnp.asarray(rng.normal(size=(9, 5)).astype(np.float32))
    z, ldj_b = layer.inverse(x)
    x2, ldj_f = layer.forward(z)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ldj_f + ldj_b), 0.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(layer.forward_(z)), np.asarray(x2), atol=0
    )

    J = jax.jacobian(lambda v: layer.inverse(v[None])[0][0])(x[0])
    _, logdet = np.linalg.slogdet(np.asarray(J))
    np.testing.assert_allclose(float(ldj_b[0]), logdet, rtol=1e-4)


def test_glow_chain_trains_and_samples():
    """actnorm + invertible-linear + couplings compose, train, sample."""
    rng = np.random.default_rng(6)
    x = (rng.normal(size=(600, 4)) * np.array([1.0, 0.4, 2.0, 0.7])
         + np.array([0.0, 3.0, -1.0, 0.0])).astype(np.float32)
    data = df.DataArrays.make(x, rng=0)
    chain = df.flow_chain(
        df.coupling_layer(4, [0, 1], key=jax.random.key(0)),
        df.invertible_linear_layer(4, key=jax.random.key(1)),
        df.coupling_layer(4, [2, 3], key=jax.random.key(2)),
        df.actnorm_layer(x),
    )
    flow = df.Flow(chain, data)
    df.train(flow, data, epochs=8, verbose=False, key=jax.random.key(3))
    assert np.all(np.isfinite(flow.training_loss))
    assert flow.training_loss[-1] < flow.training_loss[0]
    s = np.asarray(flow.sample((1000,), key=jax.random.key(4)))
    assert s.shape == (1000, 4)
    assert np.all(np.isfinite(s))


def test_glow_layers_are_trainable():
    """ActNorm and invertible-linear params receive nonzero gradients."""
    layer_a = df.actnorm_layer(3)
    layer_w = df.invertible_linear_layer(3, key=jax.random.key(5))
    chain = df.flow_chain(layer_a, layer_w)
    x = jax.random.normal(jax.random.key(6), (32, 3)) * 2.0 + 1.0

    def loss(model):
        z, ldj = model.inverse(x, jnp.zeros((32, 0)))
        return -jnp.mean(-0.5 * jnp.sum(z**2, -1) + ldj)

    g = jax.grad(loss)(chain)
    ga, gw = g.layers
    assert float(jnp.abs(ga.bias).sum()) > 0
    assert float(jnp.abs(ga.log_scale).sum()) > 0
    assert float(jnp.abs(gw.log_s).sum()) > 0
    assert float(jnp.abs(jnp.tril(gw.lower, -1)).sum()) > 0


def test_glow_checkpoint_roundtrip(tmp_path):
    chain = df.flow_chain(
        df.actnorm_layer(np.random.default_rng(7).normal(size=(100, 3)).astype(np.float32)),
        df.invertible_linear_layer(3, key=jax.random.key(7)),
    )
    df.save_element(str(tmp_path / "glow"), chain)
    chain2 = df.load_element(str(tmp_path / "glow"))
    x = jax.random.normal(jax.random.key(8), (5, 3))
    z1, l1 = chain.inverse(x, jnp.zeros((5, 0)))
    z2, l2 = chain2.inverse(x, jnp.zeros((5, 0)))
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_invertible_linear_summaries():
    assert "ActNorm" in df.actnorm_layer(3).summarize()
    assert "InvertibleLinear" in df.invertible_linear_layer(3).summarize()
