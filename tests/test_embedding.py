"""Learned condition-embedding (summary network) tests."""

import numpy as np
import jax
import jax.numpy as jnp

import densityflows_tpu as df


def _embedded_flow(data, n_raw, embed_dim, key):
    ks = jax.random.split(key, 3)
    inner = df.flow_chain(
        df.coupling_layer(2, [0], n=embed_dim, key=ks[0]),
        df.coupling_layer(2, [1], n=embed_dim, key=ks[1]),
    )
    model = df.embed_conditions(inner, n_raw, embed_dim, key=ks[2])
    return df.Flow(model, data)


def test_embedded_chain_trains_jointly_and_uses_conditions():
    """x is informative only through a 8-D raw condition vector; the
    embedding must learn to extract it (NLL beats unconditional)."""
    rng = np.random.default_rng(0)
    n = 1500
    # raw condition: 8-D noise whose MEAN shifts the data
    raw = rng.normal(size=(n, 8)).astype(np.float32)
    shift = raw.mean(axis=1, keepdims=True) * 3.0
    x = (rng.normal(size=(n, 2)) * 0.3 + shift).astype(np.float32)
    data = df.DataArrays.make(x, raw, rng=0)

    flow = _embedded_flow(data, 8, 4, jax.random.key(0))
    embed_before = jax.tree_util.tree_map(jnp.copy, flow.model.embed)
    df.train(flow, data, epochs=25, verbose=False, key=jax.random.key(1))
    assert np.all(np.isfinite(flow.training_loss))
    assert flow.training_loss[-1] < flow.training_loss[0]

    # the embedding MLP itself trained (same fused program)
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        embed_before, flow.model.embed,
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 1e-4

    # conditioning is live: different raw conditions shift the density
    lp_a = np.asarray(flow.log_prob(x[:5], np.full((5, 8), 2.0, np.float32)))
    lp_b = np.asarray(flow.log_prob(x[:5], np.full((5, 8), -2.0, np.float32)))
    assert not np.allclose(lp_a, lp_b)


def test_embedded_chain_roundtrip_and_sampling():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(300, 2)).astype(np.float32)
    raw = rng.normal(size=(300, 5)).astype(np.float32)
    data = df.DataArrays.make(x, raw, rng=0)
    flow = _embedded_flow(data, 5, 3, jax.random.key(2))

    xt = jnp.asarray(x[:20])
    th = flow.prepare_theta(raw[:20], (20,))
    z, ldj_b = flow.model.inverse(xt, th)
    x2, ldj_f = flow.model.forward(z, th)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(xt), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldj_f + ldj_b), 0.0, atol=1e-5)

    s = np.asarray(flow.sample((50,), tuple(raw[0]), key=jax.random.key(3)))
    assert s.shape == (50, 2) and np.isfinite(s).all()
    assert len(flow.model) == 2
    assert "ConditionEmbedding" in flow.model.summarize()


def test_embedded_chain_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(100, 2)).astype(np.float32)
    raw = rng.normal(size=(100, 4)).astype(np.float32)
    data = df.DataArrays.make(x, raw, rng=0)
    flow = _embedded_flow(data, 4, 3, jax.random.key(4))
    df.save_flow(str(tmp_path / "ef"), flow)
    flow2 = df.load_flow(str(tmp_path / "ef"))
    xt = jnp.asarray(x[:8])
    lp1 = np.asarray(flow.log_prob(xt, raw[:8]))
    lp2 = np.asarray(flow2.log_prob(xt, raw[:8]))
    np.testing.assert_array_equal(lp1, lp2)
