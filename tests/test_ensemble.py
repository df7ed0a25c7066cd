"""Deep-ensemble flow tests (vmapped fused training)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import densityflows_tpu as df


def _factory_for(data):
    def factory(key):
        ks = jax.random.split(key, 2)
        return df.flow_chain(
            df.coupling_layer(data, [0, 1], key=ks[0]),
            df.coupling_layer(data, [1, 2], key=ks[1]),
        )
    return factory


def _data(seed=0, n=500):
    rng = np.random.default_rng(seed)
    x = (rng.normal(size=(n, 3)) * np.array([1.0, 0.5, 2.0])).astype(np.float32)
    th = rng.choice([-1.0, 2.0], size=(n, 1)).astype(np.float32)
    return df.DataArrays.make(x, th, rng=0), x, th


def test_train_ensemble_members_differ_and_converge():
    data, x, th = _data()
    ens = df.train_ensemble(
        _factory_for(data), data, n_members=3, epochs=6,
        key=jax.random.key(0), verbose=False,
    )
    tls = np.asarray(ens.train_loss)       # (epochs, K)
    assert tls.shape == (6, 3)
    assert np.all(np.isfinite(tls))
    assert np.all(tls[-1] < tls[0])        # every member improves
    # independent inits + shuffles => members are NOT identical
    lp = np.asarray(ens.log_prob_members(x[:50], th[:50]))
    assert lp.shape == (3, 50)
    assert not np.allclose(lp[0], lp[1])


def test_ensemble_log_prob_is_mixture():
    data, x, th = _data(1)
    ens = df.train_ensemble(
        _factory_for(data), data, n_members=3, epochs=3,
        key=jax.random.key(1), verbose=False,
    )
    lp_m = np.asarray(ens.log_prob_members(x[:20], th[:20]))
    lp = np.asarray(ens.log_prob(x[:20], th[:20]))
    want = np.log(np.mean(np.exp(lp_m), axis=0))
    np.testing.assert_allclose(lp, want, rtol=1e-5)
    pr = np.asarray(ens.prob(x[:20], th[:20]))
    np.testing.assert_allclose(pr, np.exp(lp), rtol=1e-6)


def test_ensemble_member_extraction_matches():
    data, x, th = _data(2)
    ens = df.train_ensemble(
        _factory_for(data), data, n_members=2, epochs=3,
        key=jax.random.key(2), verbose=False,
    )
    m0 = ens.member(0)
    lp_member = np.asarray(m0.log_prob(x[:10], th[:10]))
    lp_stacked = np.asarray(ens.log_prob_members(x[:10], th[:10]))[0]
    np.testing.assert_allclose(lp_member, lp_stacked, rtol=1e-5)
    assert len(m0.train_loss) == 3


def test_ensemble_sampling_shape_and_mixing():
    data, x, th = _data(3)
    ens = df.train_ensemble(
        _factory_for(data), data, n_members=3, epochs=2,
        key=jax.random.key(3), verbose=False,
    )
    s = np.asarray(ens.sample((1000,), (-1.0,), key=jax.random.key(4)))
    assert s.shape == (1000, 3)
    assert np.isfinite(s).all()
    s2 = np.asarray(ens.sample((10, 7), (-1.0,), key=jax.random.key(5)))
    assert s2.shape == (10, 7, 3)


def test_stack_models_rejects_mismatched_structures():
    data, _, _ = _data(4)
    a = df.coupling_layer(data, [0, 1], key=jax.random.key(0))
    b = df.coupling_layer(data, [0], key=jax.random.key(1))  # different mask
    with pytest.raises(ValueError):
        df.stack_models([df.flow_chain(a), df.flow_chain(b)])
    with pytest.raises(ValueError):
        df.stack_models([])


def test_ensemble_checkpoint_roundtrip(tmp_path):
    data, x, th = _data(5)
    ens = df.train_ensemble(
        _factory_for(data), data, n_members=3, epochs=2,
        key=jax.random.key(6), verbose=False,
    )
    df.save_ensemble(str(tmp_path / "ens"), ens)
    ens2 = df.load_ensemble(str(tmp_path / "ens"))
    assert ens2.n_members == 3
    lp1 = np.asarray(ens.log_prob(x[:10], th[:10]))
    lp2 = np.asarray(ens2.log_prob(x[:10], th[:10]))
    np.testing.assert_array_equal(lp1, lp2)
    assert np.asarray(ens2.train_loss).shape == (2, 3)
    s = np.asarray(ens2.sample((100,), (-1.0,), key=jax.random.key(7)))
    assert s.shape == (100, 3) and np.isfinite(s).all()


def test_ensemble_member_axis_sharded_matches_unsharded():
    """mesh= shards the member axis (embarrassingly parallel, zero
    collectives); per-member loss histories must equal the unsharded run
    with the same keys."""
    from densityflows_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    x = rng.normal(size=(200, 3)).astype(np.float32)
    th = rng.uniform(0, 1, size=(200, 1)).astype(np.float32)
    data = df.DataArrays.make(x, th, rng=0)

    def factory(key):
        return df.flow_chain(
            df.coupling_block(data, None, key=key, hidden_dim_s=8,
                              hidden_dim_t=8),
            df.normalization_layer(x, -1.0, 1.0),
        )

    import optax

    kwargs = dict(n_members=8, epochs=2, batchsize=64,
                  key=jax.random.key(4), verbose=False)
    e1 = df.train_ensemble(factory, data, optimizer=optax.adam(1e-3),
                           **kwargs)
    e2 = df.train_ensemble(factory, data, optimizer=optax.adam(1e-3),
                           mesh=make_mesh(), **kwargs)
    np.testing.assert_allclose(np.asarray(e1.train_loss),
                               np.asarray(e2.train_loss), atol=1e-5)

    import pytest

    with pytest.raises(ValueError, match="multiple of the mesh"):
        df.train_ensemble(factory, data, n_members=3, epochs=1,
                          mesh=make_mesh(), verbose=False)
