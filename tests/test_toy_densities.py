"""Density-matching sanity checks on 2-D toy densities.

BASELINE.json config 2: unconditional 8-layer coupling stacks (4 blocks
= 8 coupling layers) on two-moons and rings. Checks go beyond the
reference's shape-only end-to-end test (test/runtests.jl:97-121): the
learned density must put its samples on the data manifold and rank
held-out data above uniform background points.
"""

import jax
import numpy as np
import optax
import pytest

import densityflows_tpu as df
from densityflows_tpu.utils.datasets import (
    moons_manifold_distance,
    rings,
    rings_manifold_distance,
    two_moons,
)


def _train_stack(x, *, kind, epochs=60, hidden=48, key=0):
    data = df.DataArrays.make(x, rng=0)
    ks = jax.random.split(jax.random.key(key), 4)
    blocks = [
        df.coupling_block(2, [0], kind=kind, key=k,
                          hidden_dim_s=hidden, hidden_dim_t=hidden)
        for k in ks
    ]
    chain = df.flow_chain(*blocks, df.normalization_layer(x, -1.0, 1.0))
    flow = df.Flow(chain, data)
    df.train(flow, data, optax.adam(2e-3), epochs=epochs, batchsize=256,
             verbose=False, key=jax.random.key(1))
    return flow


def _contrast(flow, x, rng=3):
    """Mean log-prob of held-out data vs uniform background over the
    data bounding box."""
    lo, hi = x.min(0), x.max(0)
    bg = np.random.default_rng(rng).uniform(
        lo, hi, size=(2000, 2)).astype(np.float32)
    lp_data = float(np.mean(np.asarray(flow.log_prob(x[:1000]))))
    lp_bg = float(np.mean(np.asarray(flow.log_prob(bg))))
    return lp_data, lp_bg


def test_two_moons_affine_stack():
    noise = 0.1
    x = two_moons(4000, noise=noise, rng=0)
    flow = _train_stack(x, kind=df.RNVPCouplingLayer)
    # measured 1.12 on CPU; generous margin against optimizer jitter
    assert flow.train_loss[-1] < 1.4
    s = np.asarray(flow.sample((4000,), key=jax.random.key(2)))
    cover = float(np.mean(moons_manifold_distance(s) < 3 * noise))
    assert cover > 0.90, f"only {cover:.1%} of samples near the moons"
    lp_data, lp_bg = _contrast(flow, x)
    assert lp_data > lp_bg + 0.5


def test_rings_spline_stack():
    # affine couplings can't cut the concentric-ring topology (measured
    # ~50% coverage); the RQS spline stack resolves it
    noise = 0.08
    x = rings(4000, noise=noise, rng=0)
    flow = _train_stack(x, kind=df.RQSCouplingLayer)
    assert flow.train_loss[-1] < 2.3  # measured 1.95
    s = np.asarray(flow.sample((4000,), key=jax.random.key(2)))
    cover = float(np.mean(rings_manifold_distance(s) < 3 * noise))
    assert cover > 0.75, f"only {cover:.1%} of samples near the rings"
    lp_data, lp_bg = _contrast(flow, x)
    assert lp_data > lp_bg + 1.0


def test_generators_are_on_manifold():
    x = two_moons(1000, noise=0.0, rng=1)
    assert x.shape == (1000, 2) and x.dtype == np.float32
    assert float(np.max(moons_manifold_distance(x))) < 1e-5
    r = rings(1000, noise=0.0, rng=1)
    assert float(np.max(rings_manifold_distance(r))) < 1e-5
    # noise actually perturbs
    xn = two_moons(1000, noise=0.1, rng=1)
    d = moons_manifold_distance(xn)
    assert 0.02 < float(np.mean(d)) < 0.3
