"""Rational-quadratic spline coupling (Neural Spline Flows addition)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import densityflows_tpu as df
from densityflows_tpu.ops.spline import rq_spline, n_spline_params


def _rand_params(key, shape, n_bins):
    return 0.5 * jax.random.normal(key, shape + (n_spline_params(n_bins),))


def test_spline_roundtrip_and_ldj_cancellation():
    n_bins = 8
    x = jnp.linspace(-2.9, 2.9, 97)
    p = _rand_params(jax.random.key(0), x.shape, n_bins)
    y, ldj_f = rq_spline(x, p, inverse=False)
    x2, ldj_b = rq_spline(y, p, inverse=True)
    np.testing.assert_allclose(x2, x, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ldj_f + ldj_b, 0.0, atol=1e-4)


def test_spline_identity_tails():
    x = jnp.array([-5.0, -3.5, 3.5, 7.0])
    p = _rand_params(jax.random.key(1), x.shape, 8)
    y, ldj = rq_spline(x, p, inverse=False)
    np.testing.assert_allclose(y, x)
    np.testing.assert_allclose(ldj, 0.0)


def test_spline_monotone():
    x = jnp.linspace(-3.0, 3.0, 301)
    p = jnp.broadcast_to(
        _rand_params(jax.random.key(2), (), 16), (301, n_spline_params(16))
    )
    y, _ = rq_spline(x, p, inverse=False)
    assert np.all(np.diff(np.asarray(y)) > 0)


def test_spline_ldj_matches_autodiff():
    n_bins = 8
    xs = jnp.linspace(-2.5, 2.5, 41)
    p = _rand_params(jax.random.key(3), (), n_bins)

    def f(x):
        return rq_spline(x, p, inverse=False)[0]

    dydx = jax.vmap(jax.grad(f))(xs)
    _, ldj = rq_spline(xs, jnp.broadcast_to(p, (41, n_spline_params(n_bins))),
                       inverse=False)
    np.testing.assert_allclose(ldj, jnp.log(dydx), rtol=1e-4, atol=1e-5)


def test_rqs_coupling_layer_roundtrip():
    layer = df.coupling_layer(
        5, [0, 1, 2], n=1, kind=df.RQSCouplingLayer,
        key=jax.random.key(4), hidden_dim_t=16,
    )
    x = 2.0 * jax.random.normal(jax.random.key(5), (40, 5))
    theta = jax.random.uniform(jax.random.key(6), (40, 1))
    z, ldj_b = layer.inverse(x, theta)
    x2, ldj_f = layer.forward(z, theta)
    np.testing.assert_allclose(x2, x, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(ldj_f + ldj_b, 0.0, atol=1e-4)
    # identity dims untouched
    np.testing.assert_array_equal(np.asarray(z[:, 3:]), np.asarray(x[:, 3:]))


def test_rqs_flow_trains():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(512, 3)).astype(np.float32) * 0.5
    data = df.DataArrays.make(x, rng=0)
    chain = df.flow_chain(
        df.coupling_layer(data, [0, 1], kind=df.RQSCouplingLayer,
                          key=jax.random.key(0), hidden_dim_t=16),
        df.coupling_layer(data, [1, 2], kind=df.RQSCouplingLayer,
                          key=jax.random.key(1), hidden_dim_t=16),
    )
    flow = df.Flow(chain, data)
    df.train(flow, data, epochs=5, verbose=False, key=jax.random.key(2))
    assert np.all(np.isfinite(flow.training_loss))
    assert flow.training_loss[-1] < flow.training_loss[0]
    s = flow.sample((100,), key=jax.random.key(3))
    assert s.shape == (100, 3)
    assert np.all(np.isfinite(np.asarray(s)))


def test_rqs_checkpoint_roundtrip(tmp_path):
    layer = df.coupling_layer(
        4, [0, 1], n=2, kind=df.RQSCouplingLayer, key=jax.random.key(7),
        n_bins=6, bound=2.5,
    )
    df.save_element(str(tmp_path / "rqs"), layer)
    layer2 = df.load_element(str(tmp_path / "rqs"))
    x = jax.random.normal(jax.random.key(8), (16, 4))
    th = jax.random.uniform(jax.random.key(9), (16, 2))
    z1, l1 = layer.inverse(x, th)
    z2, l2 = layer2.inverse(x, th)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
