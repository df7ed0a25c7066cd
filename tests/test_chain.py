"""Chain/block composition tests (mirrors reference test/runtests.jl:66-95
'chain')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import densityflows_tpu as df


def _layers():
    l1 = df.coupling_layer(7, [0, 2, 4, 6], n=2, key=jax.random.key(1))
    l2 = df.coupling_layer(7, [3, 1, 4, 0, 5], n=2, key=jax.random.key(2))
    block = df.coupling_block(7, [3, 1, 4, 0], n=2, key=jax.random.key(3))
    return l1, l2, block


def test_concatenate_lengths_and_types():
    l1, l2, block = _layers()
    small_chain = df.flow_chain(l1, l2)
    assert len(df.concatenate(small_chain, block)) == 3
    assert len(df.concatenate(block, small_chain)) == 3
    assert isinstance(small_chain[0], df.RNVPCouplingLayer)


def test_block_requires_complementary_axes():
    l1, l2, _ = _layers()
    with pytest.raises(ValueError):
        df.CouplingBlock(l1, l2)


def test_block_transforms_every_dim():
    # glorot-everywhere init: zero-init-final blocks are the identity at
    # init by design, which would defeat this structural check
    block = df.coupling_block(7, [3, 1, 4, 0], n=2, key=jax.random.key(3),
                              zero_init_final=False)
    z = jnp.asarray(np.random.default_rng(0).normal(size=(6, 7)).astype(np.float32))
    th = jnp.asarray(np.random.default_rng(1).normal(size=(6, 2)).astype(np.float32))
    x, _ = block.forward(z, th)
    # every dim transformed exactly once per block → nothing passes through
    assert not np.any(np.isclose(np.asarray(x), np.asarray(z)))


def test_chain_roundtrip_with_normalization():
    l1, l2, block = _layers()
    small_chain = df.flow_chain(l1, l2)

    rng = np.random.default_rng(2)
    x1 = 0.2 * np.ones((10, 7), np.float32)
    th = 0.1 * np.ones((10, 2), np.float32)
    x1[1] = 0.4
    th[1, 0] = 0.4

    chain = df.concatenate(
        (small_chain, df.flow_chain(block, df.normalization_layer(x1)))
    )
    assert isinstance(chain, df.FlowChain)
    assert isinstance(chain[-1], df.NormalizationLayer)

    z, ldj_b = chain.inverse(jnp.asarray(x1), jnp.asarray(th))
    x2, ldj_f = chain.forward(z, jnp.asarray(th))

    np.testing.assert_allclose(x1, x2, atol=2e-6)
    np.testing.assert_allclose(ldj_f + ldj_b, 0.0, atol=2e-6)


def test_chain_ldj_is_sum_of_layer_ldjs():
    l1, l2, _ = _layers()
    chain = df.flow_chain(l1, l2)
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32))
    th = jnp.asarray(rng.normal(size=(5, 2)).astype(np.float32))
    y1, d1 = l1.forward(z, th)
    y2, d2 = l2.forward(y1, th)
    yc, dc = chain.forward(z, th)
    np.testing.assert_allclose(yc, y2, atol=1e-7)
    np.testing.assert_allclose(dc, d1 + d2, atol=1e-6)


def test_flow_chain_factory_replication():
    build = df.flow_chain(df.coupling_block, 3, 6, None)
    chain = build(n=1, key=jax.random.key(4))
    assert len(chain) == 3
    # independently initialized
    w0 = chain[0].layer_1.s_net.weights[0]
    w1 = chain[1].layer_1.s_net.weights[0]
    assert not np.allclose(np.asarray(w0), np.asarray(w1))


def test_normalization_layer_constant_ldj():
    rng = np.random.default_rng(4)
    xdata = rng.uniform(-3, 5, size=(50, 4)).astype(np.float32)
    layer = df.normalization_layer(xdata, -1.0, 1.0)
    x = jnp.asarray(xdata[:7])
    z, ldj = layer.inverse(x)
    # inverse maps data range into [alpha, beta]
    assert float(jnp.min(z)) >= -1.0 - 1e-5
    assert float(jnp.max(z)) <= 1.0 + 1e-5
    # ldj constant across the batch
    assert np.ptp(np.asarray(ldj)) == 0.0
    x2, ldj_f = layer.forward(z)
    np.testing.assert_allclose(x2, x, atol=1e-5)
    np.testing.assert_allclose(ldj + ldj_f, 0.0, atol=1e-6)


def test_normalization_not_trainable():
    rng = np.random.default_rng(5)
    xdata = rng.uniform(0, 1, size=(30, 3)).astype(np.float32)
    layer = df.normalization_layer(xdata)
    x = jnp.asarray(xdata[:5])

    def loss(l):
        z, ldj = l.inverse(x)
        return jnp.sum(z**2) - jnp.sum(ldj)

    g = jax.grad(loss)(layer)
    np.testing.assert_array_equal(np.asarray(g.x_min), 0.0)
    np.testing.assert_array_equal(np.asarray(g.x_max), 0.0)


def test_normalization_rejects_constant_dims():
    x = np.ones((10, 3), np.float32)
    x[:, 0] = np.linspace(0, 1, 10)
    with pytest.raises(ValueError, match="zero range"):
        df.normalization_layer(x, -1.0, 1.0)


def test_permutation_layer_roundtrip_and_checkpoint(tmp_path):
    import jax

    perm = df.permutation_layer([2, 0, 1, 3])
    x = jax.random.normal(jax.random.key(0), (10, 4))
    y, ldj = perm.forward(x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x)[:, [2, 0, 1, 3]])
    np.testing.assert_array_equal(np.asarray(ldj), 0.0)
    x2, _ = perm.inverse(y)
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(x))

    chain = df.flow_chain(
        df.coupling_layer(4, [0, 1], key=jax.random.key(1),
                          hidden_dim_s=8, hidden_dim_t=8),
        perm,
        df.coupling_layer(4, [0, 1], key=jax.random.key(2),
                          hidden_dim_s=8, hidden_dim_t=8),
    )
    z, ldj_b = chain.inverse(x, None and None or jax.numpy.zeros((10, 0)))
    x3, ldj_f = chain.forward(z, jax.numpy.zeros((10, 0)))
    np.testing.assert_allclose(np.asarray(x3), np.asarray(x), atol=1e-5)

    df.save_element(str(tmp_path / "perm"), perm)
    p2 = df.load_element(str(tmp_path / "perm"))
    assert p2.perm == perm.perm

    with pytest.raises(ValueError, match="not a permutation"):
        df.permutation_layer([0, 0, 1])
