"""Coupling-layer tests (mirrors reference test/runtests.jl:43-64
'real_NVP') plus ldj-vs-autodiff-Jacobian checks the reference lacks
(SURVEY.md §4 implication)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import densityflows_tpu as df


@pytest.mark.parametrize("mask", [2, [0, 2, 4, 6]])  # contiguous and scattered
def test_rnvp_roundtrip_and_ldj_cancellation(mask):
    layer = df.coupling_layer(7, mask, n=2, key=jax.random.key(1))
    z1 = jnp.asarray(0.2 * np.ones((10, 7), np.float32))
    th = jnp.asarray(0.1 * np.ones((10, 2), np.float32))

    x, ldj_f = layer.forward(z1, th)
    z2, ldj_b = layer.inverse(x, th)

    np.testing.assert_allclose(z1, z2, atol=1e-6)
    np.testing.assert_allclose(ldj_f + ldj_b, 0.0, atol=1e-6)


def test_nice_roundtrip_volume_preserving():
    layer = df.coupling_layer(
        5, [1, 3], n=1, kind=df.NICECouplingLayer, key=jax.random.key(2)
    )
    rng = np.random.default_rng(0)
    z1 = jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32))
    th = jnp.asarray(rng.normal(size=(8, 1)).astype(np.float32))

    x, ldj_f = layer.forward(z1, th)
    z2, ldj_b = layer.inverse(x, th)
    np.testing.assert_allclose(z1, z2, atol=1e-6)
    np.testing.assert_array_equal(ldj_f, 0.0)
    np.testing.assert_array_equal(ldj_b, 0.0)


def test_identity_dims_untouched():
    layer = df.coupling_layer(6, [1, 4], n=0, key=jax.random.key(3))
    z = jnp.asarray(np.random.default_rng(1).normal(size=(4, 6)).astype(np.float32))
    x, _ = layer.forward(z, jnp.zeros((4, 0), jnp.float32))
    for i in (0, 2, 3, 5):
        np.testing.assert_array_equal(x[:, i], z[:, i])


@pytest.mark.parametrize("kind", [df.RNVPCouplingLayer, df.NICECouplingLayer])
def test_ldj_matches_autodiff_jacobian(kind):
    """log|det ∂x/∂z| from the layer must equal the autodiff Jacobian's
    log-determinant — the triangular-Jacobian argument made exact
    (reference docs/src/index.md:73-103)."""
    d, n = 4, 2
    layer = df.coupling_layer(d, [1, 3], n=n, kind=kind, key=jax.random.key(4))
    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    th = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))

    def fwd(zv):
        return layer.forward(zv[None, :], th[None, :])[0][0]

    J = jax.jacfwd(fwd)(z)
    _, ldj = layer.forward(z[None, :], th[None, :])
    sign, logdet = np.linalg.slogdet(np.asarray(J))
    assert sign == 1.0
    np.testing.assert_allclose(float(ldj[0]), logdet, rtol=1e-4, atol=1e-5)


def test_inverse_gradients_flow_to_both_nets():
    """jax.grad through the inverse pass must produce nonzero cotangents for
    s_net and t_net — the behavior the reference needs hand-written rrules
    for (src/affine/RNVP.jl:99-147)."""
    layer = df.coupling_layer(5, [0, 2], n=1, key=jax.random.key(6))
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(16, 5)).astype(np.float32))
    th = jnp.asarray(rng.normal(size=(16, 1)).astype(np.float32))

    def loss(l):
        z, ldj = l.inverse(x, th)
        return jnp.mean(jnp.sum(z**2, -1)) - jnp.mean(ldj)

    g = jax.grad(loss)(layer)
    s_norm = sum(float(jnp.sum(jnp.abs(w))) for w in g.s_net.weights)
    t_norm = sum(float(jnp.sum(jnp.abs(w))) for w in g.t_net.weights)
    assert s_norm > 0 and t_norm > 0


def test_ldj_cotangent_couples_into_s_grad():
    """The −j̄ term: d(ldj)/d(s) must contribute to s̄ (the subtle piece of
    the reference pullback, src/affine/RNVP.jl:119-143). Checked by
    comparing grad of ldj alone against autodiff of sum(s)."""
    layer = df.coupling_layer(4, [1, 2], n=0, key=jax.random.key(8))
    x = jnp.asarray(np.random.default_rng(9).normal(size=(8, 4)).astype(np.float32))
    th = jnp.zeros((8, 0), jnp.float32)

    g_ldj = jax.grad(lambda l: jnp.sum(l.inverse(x, th)[1]))(layer)
    # −Σs has gradient −Σ ds/dparams, which is nonzero for s_net weights
    s_norm = sum(float(jnp.sum(jnp.abs(w))) for w in g_ldj.s_net.weights)
    assert s_norm > 0
    # and exactly zero for t_net (ldj does not depend on t)
    t_norm = sum(float(jnp.sum(jnp.abs(w))) for w in g_ldj.t_net.weights)
    assert t_norm == 0.0


def test_forward_fast_path_matches_forward():
    layer = df.coupling_layer(6, [0, 3, 5], n=2, key=jax.random.key(10))
    rng = np.random.default_rng(11)
    z = jnp.asarray(rng.normal(size=(12, 6)).astype(np.float32))
    th = jnp.asarray(rng.normal(size=(12, 2)).astype(np.float32))
    x_full, _ = layer.forward(z, th)
    x_fast = layer.forward_(z, th)
    np.testing.assert_allclose(x_full, x_fast, atol=1e-7)


def test_bf16_activations_fp32_ldj():
    """bf16 weights/activations keep the ldj in fp32 and cancel exactly on
    roundtrip (SURVEY.md §7 numerics: 'keep s/ldj accumulation in f32')."""
    import jax

    layer = df.coupling_layer(8, [0, 1, 2, 3], n=2, key=jax.random.key(0),
                              dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.key(1), (64, 8), jnp.bfloat16)
    th = jax.random.uniform(jax.random.key(2), (64, 2), jnp.bfloat16)
    z, ldj_b = layer.inverse(x, th)
    x2, ldj_f = layer.forward(z, th)
    assert z.dtype == jnp.bfloat16
    assert ldj_b.dtype == jnp.float32
    err = jnp.max(jnp.abs(x2.astype(jnp.float32) - x.astype(jnp.float32)))
    assert float(err) < 0.1  # bf16 mantissa
    np.testing.assert_allclose(np.asarray(ldj_b + ldj_f), 0.0, atol=1e-5)


# ---- bounded log-scale (max_log_scale, Glow-style OOD guard) ----------


def test_max_log_scale_roundtrip_and_ldj():
    layer = df.coupling_layer(5, 2, n=1, key=jax.random.key(3),
                              max_log_scale=2.0, zero_init_final=False)
    z1 = jnp.asarray(np.random.default_rng(0).normal(
        size=(16, 5)).astype(np.float32))
    th = jnp.asarray(0.3 * np.ones((16, 1), np.float32))
    x, ldj_f = layer.forward(z1, th)
    z2, ldj_b = layer.inverse(x, th)
    np.testing.assert_allclose(z1, z2, atol=1e-5)
    np.testing.assert_allclose(ldj_f + ldj_b, 0.0, atol=1e-5)
    # ldj respects the bound: |sum(s)| <= M * transform_dim
    assert float(jnp.max(jnp.abs(ldj_f))) <= 2.0 * layer.axes.transform_dim


def test_max_log_scale_is_near_identity_in_distribution():
    # for small conditioner outputs, tanh-clamped == unclamped
    kw = dict(n=1, key=jax.random.key(4), zero_init_final=False)
    plain = df.coupling_layer(5, 2, **kw)
    clamped = df.coupling_layer(5, 2, max_log_scale=8.0, **kw)
    z = jnp.asarray(0.1 * np.ones((8, 5), np.float32))
    th = jnp.asarray(0.2 * np.ones((8, 1), np.float32))
    x0, l0 = plain.forward(z, th)
    x1, l1 = clamped.forward(z, th)
    np.testing.assert_allclose(x0, x1, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(l0, l1, rtol=1e-3, atol=1e-4)


def test_max_log_scale_bounds_ood_blowup():
    # deep clamped chain on wildly out-of-distribution inputs: ldj is
    # bounded and the inverse can't NaN through exp(s) overflow
    ks = jax.random.split(jax.random.key(5), 6)
    layers = [df.coupling_layer(4, [i % 4, (i + 1) % 4], key=k,
                                max_log_scale=3.0, zero_init_final=False)
              for i, k in enumerate(ks)]
    chain = df.flow_chain(*layers)
    x = jnp.asarray(np.float32(50.0) * np.ones((4, 4)))
    th = jnp.zeros((4, 0), jnp.float32)
    z, ldj = chain.inverse(x, th)
    assert bool(jnp.all(jnp.isfinite(ldj)))
    assert float(jnp.max(jnp.abs(ldj))) <= 3.0 * 2 * len(layers)


def test_max_log_scale_checkpoint_roundtrip(tmp_path):
    from densityflows_tpu.utils.checkpoint import (
        load_element, save_element)

    layer = df.coupling_layer(5, 2, n=1, key=jax.random.key(6),
                              max_log_scale=1.5)
    save_element(str(tmp_path / "layer"), layer)
    back = load_element(str(tmp_path / "layer"))
    assert back.max_log_scale == 1.5
    z = jnp.asarray(np.ones((4, 5), np.float32))
    th = jnp.asarray(np.ones((4, 1), np.float32))
    np.testing.assert_allclose(layer.forward(z, th)[0],
                               back.forward(z, th)[0], atol=1e-6)
