"""Config-driven model families (FlowConfig.family/mix/tail) tests."""

import numpy as np
import jax
import pytest

import densityflows_tpu as df
from densityflows_tpu.models.autoregressive import MAFLayer
from densityflows_tpu.models.glow import ActNormLayer, InvertibleLinearLayer
from densityflows_tpu.models.layers import NICECouplingLayer, RQSCouplingLayer
from densityflows_tpu.models.normalization import (
    LogitLayer, NormalizationLayer, PermutationLayer,
)


def _x(seed=0, n=300, d=3):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(n, d)) * [1.0, 0.5, 2.0]).astype(np.float32)


def _cfg(**kw):
    kw.setdefault("n_blocks", 2)
    return df.FlowConfig(
        net=df.NetConfig(hidden_dim_s=8, hidden_dim_t=8),
        train=df.TrainConfig(epochs=2, verbose=False),
        **kw,
    )


@pytest.mark.parametrize(
    "family,block_type",
    [("nice", NICECouplingLayer), ("rqs", RQSCouplingLayer),
     ("maf", MAFLayer)],
)
def test_families_build_and_train(family, block_type):
    flow, data, _ = df.run_experiment(
        _cfg(family=family), _x(), key=jax.random.key(0)
    )
    assert np.all(np.isfinite(flow.training_loss))
    first = flow.model.layers[0]
    inner = first.layer_1 if hasattr(first, "layer_1") else first
    assert isinstance(inner, block_type)
    s = np.asarray(flow.sample((100,), key=jax.random.key(1)))
    assert s.shape == (100, 3) and np.isfinite(s).all()


def test_mix_linear_inserts_invertible_linear():
    flow, _, _ = df.run_experiment(
        _cfg(mix="linear", n_blocks=3), _x(1), key=jax.random.key(2)
    )
    kinds = [type(l) for l in flow.model.layers]
    assert kinds.count(InvertibleLinearLayer) == 2  # between 3 blocks
    assert kinds[-1] is NormalizationLayer


def test_mix_permute_and_maf_interleave():
    flow, _, _ = df.run_experiment(
        _cfg(family="maf", n_blocks=2), _x(2), key=jax.random.key(3)
    )
    kinds = [type(l) for l in flow.model.layers]
    assert PermutationLayer in kinds


@pytest.mark.parametrize(
    "tail,tail_type",
    [("actnorm", ActNormLayer), ("logit", LogitLayer)],
)
def test_tails(tail, tail_type):
    flow, _, _ = df.run_experiment(
        _cfg(tail=tail), _x(3), key=jax.random.key(4)
    )
    assert isinstance(flow.model.layers[-1], tail_type)
    assert np.all(np.isfinite(flow.training_loss))


def test_tail_none():
    flow, _, _ = df.run_experiment(
        _cfg(tail="none"), _x(4), key=jax.random.key(5)
    )
    assert len(flow.model) == 2


def test_config_validation():
    with pytest.raises(ValueError):
        df.build_flow(_cfg(family="glow"), df.DataArrays.make(_x(), rng=0))
    with pytest.raises(ValueError):
        df.build_flow(_cfg(mix="conv"), df.DataArrays.make(_x(), rng=0))
    with pytest.raises(ValueError):
        df.build_flow(_cfg(tail="batchnorm"), df.DataArrays.make(_x(), rng=0))


def test_config_mixed_precision_and_max_log_scale():
    x = _x()
    cfg = df.FlowConfig(
        net=df.NetConfig(hidden_dim_s=8, hidden_dim_t=8, max_log_scale=3.0),
        train=df.TrainConfig(epochs=2, verbose=False, mixed_precision=True,
                             remat=True),
        n_blocks=2,
    )
    flow, data, opt_state = df.run_experiment(cfg, x, key=jax.random.key(0))
    assert np.all(np.isfinite(flow.train_loss))
    # the clamp propagated to every RNVP layer in the built chain
    from densityflows_tpu.models.blocks import CouplingBlock

    for el in flow.model.layers:
        if isinstance(el, CouplingBlock):
            assert el.layer_1.max_log_scale == 3.0
            assert el.layer_2.max_log_scale == 3.0
    # mixed precision kept master params f32
    import jax.numpy as jnp

    for a in jax.tree_util.tree_leaves(flow.model):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            assert a.dtype == jnp.float32


def test_config_joint_conditioner_family():
    from densityflows_tpu.utils.config import FlowConfig, NetConfig, TrainConfig, run_experiment
    from densityflows_tpu.models.layers import JointRNVPCouplingLayer

    rng = np.random.default_rng(0)
    x = rng.normal(size=(300, 3)).astype(np.float32)
    cfg = FlowConfig(
        net=NetConfig(hidden_dim_s=8, hidden_dim_t=8,
                      joint_conditioner=True),
        train=TrainConfig(epochs=2, batchsize=64, verbose=False),
        n_blocks=2,
    )
    flow, data, opt_state = run_experiment(cfg, x, key=jax.random.key(0))
    assert isinstance(flow.model.layers[0].layer_1, JointRNVPCouplingLayer)
    assert np.isfinite(flow.train_loss).all()
