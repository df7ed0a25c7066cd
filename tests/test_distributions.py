"""GaussianMixture / BoxUniform bases + LogitLayer tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import densityflows_tpu as df


def _mixture():
    return df.GaussianMixture(
        means=jnp.asarray([[-2.0, 0.0], [2.0, 1.0]]),
        scales=jnp.asarray([[0.5, 1.0], [1.0, 0.3]]),
        logits=jnp.asarray([0.0, jnp.log(3.0)]),  # weights 1/4, 3/4
    )


def test_mixture_log_prob_matches_dense_formula():
    gm = _mixture()
    rng = np.random.default_rng(0)
    z = rng.normal(size=(50, 2)).astype(np.float32)
    got = np.asarray(gm.log_prob(jnp.asarray(z)))

    w = np.array([0.25, 0.75])
    mu = np.asarray(gm.means)
    sc = np.asarray(gm.scales)
    dens = np.zeros(50)
    for k in range(2):
        u = (z - mu[k]) / sc[k]
        comp = np.exp(-0.5 * (u**2).sum(-1)) / (2 * np.pi * sc[k].prod())
        dens += w[k] * comp
    np.testing.assert_allclose(got, np.log(dens), rtol=1e-5)


def test_mixture_log_prob_integrates_to_one():
    gm = _mixture()
    g = np.linspace(-8, 8, 201)
    xx, yy = np.meshgrid(g, g)
    pts = jnp.asarray(np.stack([xx.ravel(), yy.ravel()], -1), jnp.float32)
    total = np.trapezoid(
        np.trapezoid(
            np.exp(np.asarray(gm.log_prob(pts))).reshape(201, 201), g, axis=1
        ),
        g,
    )
    assert abs(total - 1.0) < 1e-3


def test_mixture_sample_statistics():
    gm = _mixture()
    s = np.asarray(gm.sample(jax.random.key(0), (200_000,)))
    assert s.shape == (200_000, 2)
    want_mean = 0.25 * np.array([-2.0, 0.0]) + 0.75 * np.array([2.0, 1.0])
    np.testing.assert_allclose(s.mean(0), want_mean, atol=0.02)
    # both modes populated: P(x0<0) = 0.25·Φ(4) + 0.75·Φ(−2) ≈ 0.267
    assert (s[:, 0] < 0).mean() == pytest.approx(0.267, abs=0.01)


def test_mixture_as_flow_base_trains():
    rng = np.random.default_rng(1)
    # bimodal 2-D target
    comp = rng.integers(0, 2, size=1000)
    x = (rng.normal(size=(1000, 2)) * 0.4
         + np.where(comp[:, None] == 0, -2.0, 2.0)).astype(np.float32)
    data = df.DataArrays.make(x, rng=0)
    base = df.GaussianMixture(
        means=jnp.asarray([[-2.0, -2.0], [2.0, 2.0]]),
        scales=jnp.ones((2, 2)),
        logits=jnp.zeros((2,)),
    )
    chain = df.flow_chain(
        df.coupling_layer(2, [0], key=jax.random.key(0)),
        df.coupling_layer(2, [1], key=jax.random.key(1)),
    )
    flow = df.Flow(chain, data, base=base)
    df.train(flow, data, epochs=5, verbose=False, key=jax.random.key(2))
    assert np.all(np.isfinite(flow.training_loss))
    s = np.asarray(flow.sample((2000,), key=jax.random.key(3)))
    # samples land in both modes
    assert 0.3 < (s[:, 0] < 0).mean() < 0.7


def test_box_uniform():
    bu = df.BoxUniform(jnp.asarray([0.0, -1.0]), jnp.asarray([2.0, 1.0]))
    s = np.asarray(bu.sample(jax.random.key(0), (10_000,)))
    assert s.shape == (10_000, 2)
    assert s[:, 0].min() >= 0.0 and s[:, 0].max() <= 2.0
    lp = np.asarray(bu.log_prob(jnp.asarray([[1.0, 0.0], [3.0, 0.0]])))
    np.testing.assert_allclose(lp[0], -np.log(4.0), rtol=1e-6)
    assert lp[1] == -np.inf


def test_logit_layer_roundtrip_ldj_autodiff():
    layer = df.logit_layer((np.array([0.0, -1.0]), np.array([1.0, 3.0])))
    rng = np.random.default_rng(2)
    z = jnp.asarray(rng.normal(size=(9, 2)).astype(np.float32))
    x, ldj_f = layer.forward(z)
    x_np = np.asarray(x)
    assert (x_np[:, 0] > 0).all() and (x_np[:, 0] < 1).all()
    assert (x_np[:, 1] > -1).all() and (x_np[:, 1] < 3).all()
    z2, ldj_b = layer.inverse(x)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ldj_f + ldj_b), 0.0, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(layer.forward_(z)), x_np)

    J = jax.jacobian(lambda v: layer.forward(v[None])[0][0])(z[0])
    _, logdet = np.linalg.slogdet(np.asarray(J))
    np.testing.assert_allclose(float(ldj_f[0]), logdet, rtol=1e-4)


def test_logit_layer_from_data_and_margin():
    rng = np.random.default_rng(3)
    x = rng.uniform(2.0, 5.0, size=(500, 3)).astype(np.float32)
    layer = df.logit_layer(x, margin=0.05)
    lo, hi = np.asarray(layer.lo), np.asarray(layer.hi)
    assert (lo < x.min(0)).all() and (hi > x.max(0)).all()
    z, _ = layer.inverse(jnp.asarray(x))
    assert np.isfinite(np.asarray(z)).all()
    with pytest.raises(ValueError):
        df.logit_layer((np.ones(2), np.zeros(2)))


def test_logit_flow_trains_on_bounded_data():
    rng = np.random.default_rng(4)
    x = rng.beta(2.0, 5.0, size=(800, 2)).astype(np.float32)
    data = df.DataArrays.make(x, rng=0)
    chain = df.flow_chain(
        df.coupling_layer(2, [0], key=jax.random.key(0)),
        df.coupling_layer(2, [1], key=jax.random.key(1)),
        df.logit_layer(x, margin=0.01),
    )
    flow = df.Flow(chain, data)
    df.train(flow, data, epochs=8, verbose=False, key=jax.random.key(2))
    assert np.all(np.isfinite(flow.training_loss))
    assert flow.training_loss[-1] < flow.training_loss[0]
    s = np.asarray(flow.sample((2000,), key=jax.random.key(3)))
    # read bounds from flow.model — `chain`'s buffers were donated to the
    # fused train program
    lo = np.asarray(flow.model.layers[-1].lo)
    hi = np.asarray(flow.model.layers[-1].hi)
    assert (s >= lo).all() and (s <= hi).all()


def test_new_elements_checkpoint_roundtrip(tmp_path):
    gm = _mixture()
    df.save_element(str(tmp_path / "gm"), gm)
    gm2 = df.load_element(str(tmp_path / "gm"))
    z = jax.random.normal(jax.random.key(0), (5, 2))
    np.testing.assert_array_equal(
        np.asarray(gm.log_prob(z)), np.asarray(gm2.log_prob(z))
    )

    ll = df.logit_layer((np.zeros(2, np.float32), np.ones(2, np.float32)))
    df.save_element(str(tmp_path / "ll"), ll)
    ll2 = df.load_element(str(tmp_path / "ll"))
    x1, l1 = ll.forward(z)
    x2, l2 = ll2.forward(z)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))

    bu = df.BoxUniform(jnp.zeros(3), jnp.ones(3) * 2)
    df.save_element(str(tmp_path / "bu"), bu)
    bu2 = df.load_element(str(tmp_path / "bu"))
    np.testing.assert_array_equal(np.asarray(bu2.hi), np.asarray(bu.hi))
