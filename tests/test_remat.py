"""Rematerialization (jax.checkpoint) training-path tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

import densityflows_tpu as df
from densityflows_tpu.train import masked_nll_loss, make_train_step


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.normal(size=(200, 3)) * [1.0, 0.5, 2.0]).astype(np.float32)
    data = df.DataArrays.make(x, rng=0)
    chain = df.flow_chain(
        df.coupling_layer(data, [0, 1], key=jax.random.key(0)),
        df.coupling_layer(data, [1, 2], key=jax.random.key(1)),
        df.normalization_layer(x, -1.0, 1.0),
    )
    return chain, data, x


def test_remat_gradients_match_plain():
    chain, data, x = _setup()
    base = df.StandardNormal(3)
    xb = jnp.asarray(x[:64])
    th = jnp.zeros((64, 0))
    mask = jnp.ones((64,))

    g_plain = jax.grad(masked_nll_loss)(chain, base, xb, th, mask)
    g_remat = jax.grad(
        lambda m: masked_nll_loss(m, base, xb, th, mask, remat=True)
    )(chain)
    errs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), g_plain, g_remat
    )
    assert max(jax.tree_util.tree_leaves(errs)) < 1e-5


def test_remat_on_embedded_chain():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(100, 2)).astype(np.float32)
    raw = rng.normal(size=(100, 4)).astype(np.float32)
    data = df.DataArrays.make(x, raw, rng=0)
    inner = df.flow_chain(df.coupling_layer(2, [0], n=3, key=jax.random.key(0)))
    model = df.embed_conditions(inner, 4, 3, key=jax.random.key(1))
    base = df.StandardNormal(2)
    xb = jnp.asarray(x[:32])
    th = jnp.asarray(raw[:32])
    mask = jnp.ones((32,))
    g_plain = jax.grad(masked_nll_loss)(model, base, xb, th, mask)
    g_remat = jax.grad(
        lambda m: masked_nll_loss(m, base, xb, th, mask, remat=True)
    )(model)
    errs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), g_plain, g_remat
    )
    assert max(jax.tree_util.tree_leaves(errs)) < 1e-5


def test_remat_train_end_to_end():
    chain, data, x = _setup(2)
    flow = df.Flow(chain, data)
    df.train(flow, data, epochs=4, verbose=False, key=jax.random.key(2),
             remat=True)
    assert np.all(np.isfinite(flow.training_loss))
    assert flow.training_loss[-1] < flow.training_loss[0]


def test_remat_streaming_step():
    chain, data, x = _setup(3)
    optimizer = optax.adam(1e-3)
    step = make_train_step(optimizer, remat=True)
    base = df.StandardNormal(3)
    opt_state = optimizer.init(chain)
    model, opt_state, loss = step(
        chain, opt_state, base, jnp.asarray(x[:64]), jnp.zeros((64, 0)),
        jnp.ones((64,)),
    )
    assert np.isfinite(float(loss))
