"""Masked autoregressive flow (MAF + MADE) tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import densityflows_tpu as df
from densityflows_tpu.ops.made import init_made, apply_made


def test_made_autoregressive_property():
    """out block i must be invariant to perturbations of x_{>=i}."""
    d, n_cond, P = 5, 2, 2
    net = init_made(jax.random.key(0), d, n_cond, P, hidden_dim=32,
                    zero_final=False)
    rng = np.random.default_rng(0)
    theta = jnp.asarray(rng.normal(size=(7, n_cond)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(7, d)).astype(np.float32))

    out = apply_made(net, jnp.concatenate([theta, x], -1))
    out = np.asarray(out).reshape(7, d, P)
    for i in range(d):
        x2 = x.at[:, i:].add(1.0)  # perturb dims >= i
        out2 = np.asarray(
            apply_made(net, jnp.concatenate([theta, x2], -1))
        ).reshape(7, d, P)
        # outputs for dims <= i unchanged (param block i depends on x_{<i})
        np.testing.assert_array_equal(out2[:, : i + 1], out[:, : i + 1])


def test_made_sees_conditions():
    d, n_cond = 3, 1
    net = init_made(jax.random.key(1), d, n_cond, 2, hidden_dim=16,
                    zero_final=False)
    x = jnp.zeros((4, d))
    a = apply_made(net, jnp.concatenate([jnp.zeros((4, 1)), x], -1))
    b = apply_made(net, jnp.concatenate([jnp.ones((4, 1)), x], -1))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_maf_roundtrip_and_ldj():
    layer = df.maf_layer(4, n=1, key=jax.random.key(2), hidden_dim=32)
    # non-identity weights: perturb the zero-init final layer
    leaves, treedef = jax.tree_util.tree_flatten(layer)
    rng = np.random.default_rng(3)
    leaves = [jnp.asarray(l) + 0.1 * jnp.asarray(rng.normal(size=l.shape),
                                                 l.dtype)
              for l in leaves]
    layer = jax.tree_util.tree_unflatten(treedef, leaves)

    x = jnp.asarray(rng.normal(size=(9, 4)).astype(np.float32))
    th = jnp.asarray(rng.uniform(size=(9, 1)).astype(np.float32))
    z, ldj_b = layer.inverse(x, th)
    x2, ldj_f = layer.forward(z, th)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ldj_f + ldj_b), 0.0, atol=1e-4)


def test_maf_ldj_matches_autodiff():
    layer = df.maf_layer(3, key=jax.random.key(4), hidden_dim=16)
    leaves, treedef = jax.tree_util.tree_flatten(layer)
    rng = np.random.default_rng(5)
    leaves = [jnp.asarray(l) + 0.2 * jnp.asarray(rng.normal(size=l.shape), l.dtype)
              for l in leaves]
    layer = jax.tree_util.tree_unflatten(treedef, leaves)

    x = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))
    th = jnp.zeros((0,))

    J = jax.jacobian(lambda v: layer.inverse(v[None], th[None])[0][0])(x)
    _, logdet = np.linalg.slogdet(np.asarray(J))
    _, ldj = layer.inverse(x[None], th[None])
    np.testing.assert_allclose(float(ldj[0]), logdet, rtol=1e-4)


def test_maf_flow_trains_and_samples():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(600, 3)) * np.array([1.0, 0.5, 2.0])).astype(np.float32)
    data = df.DataArrays.make(x, rng=0)
    chain = df.flow_chain(
        df.maf_layer(3, key=jax.random.key(0), hidden_dim=32),
        df.permutation_layer(3),
        df.maf_layer(3, key=jax.random.key(1), hidden_dim=32),
    )
    flow = df.Flow(chain, data)
    df.train(flow, data, epochs=8, verbose=False, key=jax.random.key(2))
    assert np.all(np.isfinite(flow.training_loss))
    assert flow.training_loss[-1] < flow.training_loss[0]
    s = np.asarray(flow.sample((2000,), key=jax.random.key(3)))
    assert s.shape == (2000, 3)
    assert np.all(np.isfinite(s))


def test_maf_checkpoint_roundtrip(tmp_path):
    layer = df.maf_layer(4, n=2, key=jax.random.key(6), hidden_dim=16)
    df.save_element(str(tmp_path / "maf"), layer)
    layer2 = df.load_element(str(tmp_path / "maf"))
    x = jax.random.normal(jax.random.key(7), (5, 4))
    th = jax.random.uniform(jax.random.key(8), (5, 2))
    z1, l1 = layer.inverse(x, th)
    z2, l2 = layer2.inverse(x, th)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))


def test_iaf_roundtrip_and_duality():
    """IAF forward is parallel and inverts exactly via the scan path."""
    layer = df.iaf_layer(4, n=1, key=jax.random.key(9), hidden_dim=32)
    leaves, treedef = jax.tree_util.tree_flatten(layer)
    rng = np.random.default_rng(10)
    leaves = [jnp.asarray(l) + 0.1 * jnp.asarray(rng.normal(size=l.shape), l.dtype)
              for l in leaves]
    layer = jax.tree_util.tree_unflatten(treedef, leaves)
    z = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    th = jnp.asarray(rng.uniform(size=(6, 1)).astype(np.float32))
    x, ldj_f = layer.forward(z, th)
    z2, ldj_b = layer.inverse(x, th)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ldj_f + ldj_b), 0.0, atol=1e-4)


def test_iaf_checkpoint_roundtrip(tmp_path):
    layer = df.iaf_layer(3, key=jax.random.key(11), hidden_dim=16)
    df.save_element(str(tmp_path / "iaf"), layer)
    layer2 = df.load_element(str(tmp_path / "iaf"))
    assert type(layer2).__name__ == "IAFLayer"
    z = jax.random.normal(jax.random.key(12), (4, 3))
    x1, _ = layer.forward(z, jnp.zeros((4, 0)))
    x2, _ = layer2.forward(z, jnp.zeros((4, 0)))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
