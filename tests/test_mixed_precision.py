"""Mixed-precision training: bf16 conditioner compute, f32 master state.

Contract (train.py ``mixed_precision=True``, models/layers.py
``cast_conditioners``): conditioner-MLP/MADE weights are cast to bf16
inside the loss only — master params, grads, optimizer state, ldj, and
the per-epoch loss histories stay f32; transform constants
(normalization, actnorm, invertible-linear LU factors) are never cast.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import densityflows_tpu as df
from densityflows_tpu.models.layers import cast_conditioners
from densityflows_tpu.train import make_train_step, masked_nll_loss


def _tiny_flow(data, key=None):
    ks = jax.random.split(key if key is not None else jax.random.key(0), 2)
    x = np.asarray(data.x)
    chain = df.flow_chain(
        df.coupling_layer(data, [0, 1], hidden_dim_s=8, hidden_dim_t=8,
                          key=ks[0]),
        df.coupling_layer(data, [2, 3], hidden_dim_s=8, hidden_dim_t=8,
                          key=ks[1]),
        df.normalization_layer(x, -1.0, 1.0),
    )
    return df.Flow(chain, data)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(512, 4)).astype(np.float32)
    theta = rng.uniform(-1, 1, size=(512, 1)).astype(np.float32)
    return df.DataArrays.make(x, theta, rng=0)


def _float_leaves(tree):
    return [a for a in jax.tree_util.tree_leaves(tree)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)]


def test_cast_conditioners_targets_nets_only(data):
    flow = _tiny_flow(data)
    model = flow.model
    cast = cast_conditioners(model, jnp.bfloat16)
    # conditioner weights became bf16
    for layer in cast.layers[:2]:
        assert all(w.dtype == jnp.bfloat16 for w in layer.s_net.weights)
        assert all(w.dtype == jnp.bfloat16 for w in layer.t_net.weights)
    # normalization constants untouched
    norm0, norm1 = model.layers[-1], cast.layers[-1]
    for a, b in zip(_float_leaves(norm0), _float_leaves(norm1)):
        assert b.dtype == a.dtype == jnp.float32
    # original model untouched (pure function)
    assert all(
        w.dtype == jnp.float32 for w in model.layers[0].s_net.weights
    )


def test_cast_conditioners_covers_made_and_glow():
    key = jax.random.key(1)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(64, 4)).astype(np.float32)
    ks = jax.random.split(key, 2)
    chain = df.flow_chain(
        df.maf_layer(4, n=0, hidden_dim=8, key=ks[0]),
        df.invertible_linear_layer(4, key=ks[1]),
        df.actnorm_layer(x),
    )
    cast = cast_conditioners(chain, jnp.bfloat16)
    assert all(w.dtype == jnp.bfloat16 for w in cast.layers[0].net.weights)
    # LU factors / actnorm scales stay f32 (ldj precision)
    for layer in cast.layers[1:]:
        for a in _float_leaves(layer):
            assert a.dtype == jnp.float32


def test_mixed_precision_loss_and_grads_stay_f32(data):
    flow = _tiny_flow(data)
    x, th = data.normalized_training_data(flow.metadata)
    x, th = jnp.asarray(x[:64]), jnp.asarray(th[:64])
    mask = jnp.ones((64,), jnp.float32)

    loss_fn = lambda m: masked_nll_loss(m, flow.base, x, th, mask,
                                        mixed_precision=True)
    loss, grads = jax.value_and_grad(loss_fn)(flow.model)
    assert loss.dtype == jnp.float32 and np.isfinite(float(loss))
    for g in _float_leaves(grads):
        assert g.dtype == jnp.float32

    # the bf16 compute path differs from f32 but only by rounding
    loss_f32 = masked_nll_loss(flow.model, flow.base, x, th, mask)
    assert abs(float(loss) - float(loss_f32)) < 0.05 * (
        1.0 + abs(float(loss_f32)))


def test_train_step_mixed_precision_keeps_f32_params(data):
    flow = _tiny_flow(data)
    opt = optax.adam(1e-3)
    step = make_train_step(opt, mixed_precision=True)
    x, th = data.normalized_training_data(flow.metadata)
    x, th = jnp.asarray(x[:64]), jnp.asarray(th[:64])
    mask = jnp.ones((64,), jnp.float32)
    model, opt_state, loss = step(flow.model, opt.init(flow.model),
                                  flow.base, x, th, mask)
    assert np.isfinite(float(loss))
    for a in _float_leaves(model):
        assert a.dtype == jnp.float32
    for a in _float_leaves(opt_state):
        assert a.dtype == jnp.float32


def test_train_mixed_precision_converges_like_f32(data):
    nlls = {}
    for mp in (False, True):
        flow = _tiny_flow(data, key=jax.random.key(7))
        df.train(flow, data, optax.adam(1e-2), epochs=15, verbose=False,
                 key=jax.random.key(3), mixed_precision=mp)
        assert len(flow.train_loss) == 15
        assert np.all(np.isfinite(flow.train_loss))
        nlls[mp] = flow.train_loss[-1]
    # matched convergence within loose rounding tolerance
    assert abs(nlls[True] - nlls[False]) < 0.15 * (1.0 + abs(nlls[False]))
    # and it actually trained
    first_flow = _tiny_flow(data, key=jax.random.key(7))
    z, ldj = first_flow.model.inverse(jnp.asarray(data.x[:64]),
                                      jnp.asarray(data.theta[:64]))
    init_nll = -float(jnp.mean(first_flow.base.log_prob(z) + ldj))
    assert nlls[True] < init_nll
