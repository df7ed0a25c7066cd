"""Whole-run fused training kernel (ops/pallas_train.py, interpret mode).

The kernel replicates `train.make_train_program` exactly — same shuffle
keys, same batch composition, same masked-NLL/Adam math — so the parity
bar here is float-accumulation-order noise (~1e-5), not a statistical
tolerance. On real TPUs the same comparison is gated by
benchmarks/fused_train_probe.py and bench.py.
"""

import dataclasses

import jax
import numpy as np
import pytest

import densityflows_tpu as df
from densityflows_tpu.models.fused_train import (
    UnsupportedFusedTrain,
    chain_train_fold,
    train_fused,
)
from densityflows_tpu.models.layers import NICECouplingLayer

ATOL = 1e-4


@pytest.fixture(scope="module")
def cond_data():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(137, 5)).astype(np.float32)
    th = rng.uniform(-1, 2, size=(137, 1)).astype(np.float32)
    return df.DataArrays.make(x, th, rng=0), x


def _parity(data, x, chain_fn, epochs=4, bs=32):
    def build():
        return df.Flow(chain_fn(data, x), data)

    f_j, f_f = build(), build()
    os_j = df.train(f_j, data, epochs=epochs, batchsize=bs, verbose=False,
                    key=jax.random.key(3))
    os_f = df.train(f_f, data, epochs=epochs, batchsize=bs, verbose=False,
                    key=jax.random.key(3), fused_kernel=True)
    np.testing.assert_allclose(f_j.train_loss, f_f.train_loss, atol=ATOL)
    np.testing.assert_allclose(f_j.valid_loss, f_f.valid_loss, atol=ATOL)
    for a, b in zip(jax.tree_util.tree_leaves(f_j.model),
                    jax.tree_util.tree_leaves(f_f.model)):
        if a.size:
            np.testing.assert_allclose(a, b, atol=ATOL)
    return f_j, f_f, os_j, os_f


def test_reference_config_parity(cond_data):
    data, x = cond_data
    ks = jax.random.split(jax.random.key(0), 3)
    f_j, f_f, os_j, os_f = _parity(
        data, x,
        lambda d, xx: df.flow_chain(
            df.coupling_layer(d, [0, 1, 2], hidden_dim_s=16,
                              hidden_dim_t=16, key=ks[0]),
            df.coupling_layer(d, [2, 3, 4], hidden_dim_s=16,
                              hidden_dim_t=16, key=ks[1]),
            df.coupling_layer(d, [4, 0, 1], hidden_dim_s=16,
                              hidden_dim_t=16, key=ks[2]),
            df.normalization_layer(xx, -1.0, 1.0),
        ),
    )
    # optax-compatible opt_state: same Adam moments, same count
    assert int(os_j[0].count) == int(os_f[0].count)
    for a, b in zip(jax.tree_util.tree_leaves(os_j[0].mu),
                    jax.tree_util.tree_leaves(os_f[0].mu)):
        if a.size:
            np.testing.assert_allclose(a, b, atol=ATOL)


@pytest.mark.parametrize("variant", ["nice", "joint", "nobias_tanh",
                                     "no_norm", "deep", "clamped",
                                     "clamped_joint"])
def test_variant_parity(cond_data, variant):
    data, x = cond_data
    ks = jax.random.split(jax.random.key(0), 2)
    builders = {
        "nice": lambda d, xx: df.flow_chain(
            df.coupling_layer(d, [0, 1, 2], kind=NICECouplingLayer,
                              key=ks[0]),
            df.coupling_layer(d, [2, 3, 4], kind=NICECouplingLayer,
                              key=ks[1]),
            df.normalization_layer(xx, -1.0, 1.0),
        ),
        "joint": lambda d, xx: df.flow_chain(
            df.coupling_layer(d, [0, 1, 2], key=ks[0],
                              joint_conditioner=True,
                              hidden_dim_s=24, hidden_dim_t=24),
            df.coupling_layer(d, [2, 3, 4], key=ks[1],
                              joint_conditioner=True,
                              hidden_dim_s=24, hidden_dim_t=24),
            df.normalization_layer(xx, -1.0, 1.0),
        ),
        "nobias_tanh": lambda d, xx: df.flow_chain(
            df.coupling_block(d.num_dimensions, [0, 2, 4], n=1, key=ks[0],
                              activation_s="tanh", activation_t="tanh",
                              bias=False, hidden_dim_s=8, hidden_dim_t=8),
            df.normalization_layer(xx, -1.0, 1.0),
        ),
        "no_norm": lambda d, xx: df.flow_chain(
            df.coupling_layer(d, [0, 1, 2], key=ks[0], hidden_dim_s=16,
                              hidden_dim_t=16),
            df.coupling_layer(d, [2, 3, 4], key=ks[1], hidden_dim_s=16,
                              hidden_dim_t=16),
        ),
        "deep": lambda d, xx: df.flow_chain(
            df.coupling_layer(d, [0, 1, 2], key=ks[0], n_sublayers_s=3,
                              n_sublayers_t=3, hidden_dim_s=12,
                              hidden_dim_t=12),
            df.normalization_layer(xx, -1.0, 1.0),
        ),
        # Glow-style tanh log-scale clamp: a LOW clamp so the nonlinear
        # region is actually exercised (a loose clamp would reduce to the
        # unclamped math and prove nothing)
        "clamped": lambda d, xx: df.flow_chain(
            df.coupling_layer(d, [0, 1, 2], key=ks[0], hidden_dim_s=16,
                              hidden_dim_t=16, max_log_scale=0.1),
            df.coupling_layer(d, [2, 3, 4], key=ks[1], hidden_dim_s=16,
                              hidden_dim_t=16, max_log_scale=0.5),
            df.normalization_layer(xx, -1.0, 1.0),
        ),
        "clamped_joint": lambda d, xx: df.flow_chain(
            df.coupling_layer(d, [0, 1, 2], key=ks[0],
                              joint_conditioner=True, hidden_dim_s=24,
                              hidden_dim_t=24, max_log_scale=0.2),
            df.normalization_layer(xx, -1.0, 1.0),
        ),
    }
    _parity(data, x, builders[variant])


def test_unconditional_parity():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(90, 4)).astype(np.float32)
    data = df.DataArrays.make(x, rng=0)
    key = jax.random.key(0)
    _parity(data, x, lambda d, xx: df.flow_chain(
        df.coupling_layer(d, [0, 1], key=key, hidden_dim_s=8,
                          hidden_dim_t=8),
        df.normalization_layer(xx, -1.0, 1.0),
    ), epochs=3)


def test_cross_path_continuation(cond_data):
    """A fused run continued by the jnp program (and vice versa) matches
    the all-jnp two-stage run — the opt_state roundtrips exactly."""
    data, x = cond_data
    key = jax.random.key(0)

    def build():
        return df.Flow(df.flow_chain(
            df.coupling_layer(data, [0, 1, 2], key=key, hidden_dim_s=16,
                              hidden_dim_t=16),
            df.normalization_layer(x, -1.0, 1.0),
        ), data)

    f_ref = build()
    s = df.train(f_ref, data, epochs=3, verbose=False, key=jax.random.key(5))
    df.train(f_ref, data, opt_state=s, epochs=3, verbose=False,
             key=jax.random.key(6))

    f_a = build()  # fused -> jnp
    s = df.train(f_a, data, epochs=3, verbose=False, key=jax.random.key(5),
                 fused_kernel=True)
    df.train(f_a, data, opt_state=s, epochs=3, verbose=False,
             key=jax.random.key(6))
    np.testing.assert_allclose(f_a.valid_loss, f_ref.valid_loss, atol=ATOL)

    f_b = build()  # jnp -> fused
    s = df.train(f_b, data, epochs=3, verbose=False, key=jax.random.key(5))
    df.train(f_b, data, opt_state=s, epochs=3, verbose=False,
             key=jax.random.key(6), fused_kernel=True)
    np.testing.assert_allclose(f_b.valid_loss, f_ref.valid_loss, atol=ATOL)


def test_unsupported_raises(cond_data):
    data, x = cond_data
    key = jax.random.key(0)
    flow = df.Flow(df.flow_chain(
        df.coupling_layer(data, [0, 1, 2], key=key),
        df.normalization_layer(x, -1.0, 1.0),
    ), data)

    import optax

    with pytest.raises(ValueError, match="built-in Adam"):
        df.train(flow, data, optax.adam(1e-3), epochs=1, verbose=False,
                 fused_kernel=True)
    with pytest.raises(ValueError, match="plain training surface"):
        df.train(flow, data, epochs=1, verbose=False, fused_kernel=True,
                 mixed_precision=True)
    with pytest.raises(ValueError, match="one entry per data row"):
        df.train(flow, data, epochs=1, verbose=False, fused_kernel=True,
                 weights=np.ones(3))

    # unsupported layer types fall out of the fold (permutations fold
    # away since r4, so use a genuinely unsupported layer)
    unsupported = df.Flow(df.flow_chain(
        df.coupling_layer(data, [0, 1, 2], key=key),
        df.invertible_linear_layer(5, key=jax.random.key(2)),
    ), data)
    with pytest.raises(UnsupportedFusedTrain):
        df.train(unsupported, data, epochs=1, verbose=False,
                 fused_kernel=True)


def test_fold_unfold_roundtrip(cond_data):
    """unfold(fold(chain)) reproduces every weight bit-for-bit."""
    data, x = cond_data
    key = jax.random.key(9)
    chain = df.flow_chain(
        df.coupling_layer(data, [0, 1, 2], key=key, hidden_dim_s=16,
                          hidden_dim_t=16),
        df.coupling_layer(data, [2, 3, 4], key=jax.random.key(10),
                          joint_conditioner=True, hidden_dim_s=16,
                          hidden_dim_t=16),
        df.normalization_layer(x, -1.0, 1.0),
    )
    (_plan, _tc, tparams, _m, _ms, _c, _fold_state,
     unfold) = chain_train_fold(chain)
    rebuilt = unfold(list(tparams))
    for a, b in zip(jax.tree_util.tree_leaves(chain),
                    jax.tree_util.tree_leaves(rebuilt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vmem_budget_guard(cond_data):
    """Since r5, long runs chunk and large datasets stream — the only
    remaining envelope rejection is a MODEL whose streaming working set
    exceeds VMEM (exercised by shrinking the budget below it; nothing
    may be materialized first)."""
    import densityflows_tpu.models.fused_train as ft

    data, x = cond_data
    flow = df.Flow(df.flow_chain(
        df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                          hidden_dim_s=8, hidden_dim_t=8),
        df.normalization_layer(x, -1.0, 1.0),
    ), data)
    orig = ft._BUDGET
    try:
        ft._BUDGET = 1024  # below any real model's working set
        with pytest.raises(UnsupportedFusedTrain, match="VMEM"):
            train_fused(flow, data, epochs=3, verbose=False,
                        key=jax.random.key(1))
    finally:
        ft._BUDGET = orig


def test_chunked_kernel_bit_identical(cond_data):
    """A run too long for one kernel call splits into epoch chunks that
    must reproduce the single-call run BIT-FOR-BIT (same sliced shuffle
    keys, folded state carried on device, Adam count continued) — with
    weights, track_best, and the non-finite guard all riding along
    (VERDICT r4 items 4/8)."""
    import densityflows_tpu.models.fused_train as ft

    rng = np.random.default_rng(11)
    x = rng.normal(size=(120, 4)).astype(np.float32)
    x[[5, 40, 77], 1] = np.nan  # real skips exercise the count carry
    w = rng.uniform(0.3, 2.0, size=120).astype(np.float32)
    data = df.DataArrays.make(x, rng=0)

    def build():
        return df.Flow(df.flow_chain(
            df.coupling_layer(data, [0, 1], key=jax.random.key(0),
                              hidden_dim_s=8, hidden_dim_t=8),
            df.coupling_layer(data, [2, 3], key=jax.random.key(1),
                              hidden_dim_s=8, hidden_dim_t=8),
        ), data)

    kw = dict(epochs=9, batchsize=16, verbose=False,
              key=jax.random.key(5), weights=w, skip_nonfinite=True)
    f_a = build()
    os_a = ft.train_fused(f_a, data, **kw)

    nb = -(-len(data.partition.training) // 16)
    orig = ft._HBM_SLAB_BUDGET
    try:
        ft._HBM_SLAB_BUDGET = 4 * nb * 16 * 4 * 4  # 4 epochs per chunk
        f_b = build()
        os_b = ft.train_fused(f_b, data, **kw)
    finally:
        ft._HBM_SLAB_BUDGET = orig

    def same_hist(a, b):
        return all((x == y) or (np.isnan(x) and np.isnan(y))
                   for x, y in zip(a, b))

    assert same_hist(f_a.train_loss, f_b.train_loss)
    assert same_hist(f_a.valid_loss, f_b.valid_loss)
    assert f_a.skipped_updates == f_b.skipped_updates
    assert sum(f_b.skipped_updates) > 0
    assert int(os_a[0].count) == int(os_b[0].count)
    for a, b in zip(jax.tree_util.tree_leaves((f_a.model,
                                               os_a[0].mu, os_a[0].nu)),
                    jax.tree_util.tree_leaves((f_b.model,
                                               os_b[0].mu, os_b[0].nu))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunked_kernel_track_best_and_weights(cond_data):
    """Chunked track_best selects the global best across chunk
    boundaries and equals the single-call kernel exactly."""
    import densityflows_tpu.models.fused_train as ft

    data, x = cond_data
    rng = np.random.default_rng(3)
    w = rng.uniform(0.3, 2.0, size=data.x.shape[0]).astype(np.float32)

    def build():
        return df.Flow(df.flow_chain(
            df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                              hidden_dim_s=8, hidden_dim_t=8),
            df.normalization_layer(x, -1.0, 1.0),
        ), data)

    kw = dict(epochs=9, batchsize=32, verbose=False,
              key=jax.random.key(5), weights=w, track_best=True)
    f_a = build()
    os_a, best_a = ft.train_fused(f_a, data, **kw)

    nb = -(-len(data.partition.training) // 32)
    orig = ft._HBM_SLAB_BUDGET
    try:
        ft._HBM_SLAB_BUDGET = 3 * nb * 32 * 6 * 4  # 3 epochs per chunk
        f_b = build()
        os_b, best_b = ft.train_fused(f_b, data, **kw)
    finally:
        ft._HBM_SLAB_BUDGET = orig

    assert f_a.train_loss == f_b.train_loss
    assert f_a.valid_loss == f_b.valid_loss
    assert int(os_a[0].count) == int(os_b[0].count)
    for a, b in zip(jax.tree_util.tree_leaves((f_a.model, best_a)),
                    jax.tree_util.tree_leaves((f_b.model, best_b))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_auto_routing_decision(cond_data, monkeypatch):
    """fused_kernel='auto' routes to the kernel exactly when (a) the
    backend is TPU, (b) the call is on the plain surface; a fold-stage
    UnsupportedFusedTrain falls back to the jnp program silently."""
    import densityflows_tpu.models.fused_train as ft

    data, x = cond_data

    def build():
        return df.Flow(df.flow_chain(
            df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                              hidden_dim_s=8, hidden_dim_t=8),
            df.normalization_layer(x, -1.0, 1.0),
        ), data)

    calls = []

    def fake_train_fused(*a, **k):
        calls.append(k)
        raise ft.UnsupportedFusedTrain("probe: force jnp fallback")

    monkeypatch.setattr(ft, "train_fused", fake_train_fused)

    # CPU backend (the test rig): auto never touches the kernel
    flow = build()
    df.train(flow, data, epochs=1, verbose=False, key=jax.random.key(1))
    assert calls == []
    assert len(flow.train_loss) == 1  # jnp path ran

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    # TPU backend + plain surface: kernel attempted, fallback still works
    flow = build()
    df.train(flow, data, epochs=1, verbose=False, key=jax.random.key(1))
    assert len(calls) == 1
    assert len(flow.train_loss) == 1  # fell back to the jnp program

    # off the plain surface: kernel not attempted
    df.train(flow, data, epochs=1, verbose=False, key=jax.random.key(1),
             mixed_precision=True)
    df.train(flow, data, optax_adam_explicit(), epochs=1, verbose=False,
             key=jax.random.key(1))
    assert len(calls) == 1

    # fused_kernel=False: never attempted even on TPU
    df.train(flow, data, epochs=1, verbose=False, key=jax.random.key(1),
             fused_kernel=False)
    assert len(calls) == 1


def optax_adam_explicit():
    import optax

    return optax.adam(1e-3)


def test_track_best_matches_jnp(cond_data):
    """In-kernel best-epoch selection == the jnp program's track_best
    (the early-stopping restore path)."""
    from densityflows_tpu.models.fused_train import train_fused as tf

    data, x = cond_data

    def build():
        return df.Flow(df.flow_chain(
            df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                              hidden_dim_s=16, hidden_dim_t=16),
            df.normalization_layer(x, -1.0, 1.0),
        ), data)

    f_j, f_f = build(), build()
    _, best_j = df.train(f_j, data, epochs=6, batchsize=32, verbose=False,
                         key=jax.random.key(4), _track_best=True,
                         fused_kernel=False)
    _, best_f = tf(f_f, data, epochs=6, batchsize=32, verbose=False,
                   key=jax.random.key(4), track_best=True)
    for a, b in zip(jax.tree_util.tree_leaves(best_j),
                    jax.tree_util.tree_leaves(best_f)):
        if a.size:
            np.testing.assert_allclose(a, b, atol=ATOL)


def test_early_stopping_drivers_accept_none_optimizer(cond_data, tmp_path):
    """The chunked drivers leave optimizer=None so plain-surface chunks
    can auto-route through the fused kernel on TPU (r4)."""
    data, x = cond_data
    flow = df.Flow(df.flow_chain(
        df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                          hidden_dim_s=8, hidden_dim_t=8),
        df.normalization_layer(x, -1.0, 1.0),
    ), data)
    df.train(flow, data, epochs=8, batchsize=32, verbose=False,
             key=jax.random.key(1), early_stopping_patience=4,
             early_stopping_check_every=4)
    assert len(flow.train_loss) >= 4
    df.train(flow, data, epochs=4, batchsize=32, verbose=False,
             key=jax.random.key(2), checkpoint_dir=str(tmp_path),
             checkpoint_every=2)
    assert np.isfinite(flow.train_loss).all()


def test_auto_falls_back_on_runtime_error(cond_data, monkeypatch, capsys):
    """If the VMEM estimator under-predicts and Mosaic compilation fails,
    auto mode warns and falls back to the jnp program instead of
    crashing (the flow is untouched by the failed attempt)."""
    import densityflows_tpu.models.fused_train as ft

    data, x = cond_data
    flow = df.Flow(df.flow_chain(
        df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                          hidden_dim_s=8, hidden_dim_t=8),
        df.normalization_layer(x, -1.0, 1.0),
    ), data)

    def boom(*a, **k):
        raise jax.errors.JaxRuntimeError(
            "RESOURCE_EXHAUSTED: scoped vmem (simulated)")

    monkeypatch.setattr(ft, "train_fused", boom)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    df.train(flow, data, epochs=1, verbose=False, key=jax.random.key(1))
    assert len(flow.train_loss) == 1  # jnp program completed the run
    assert "jnp program" in capsys.readouterr().out


def test_weighted_parity(cond_data):
    """Importance-weighted training (the SNPE-B correction) in the
    kernel == train(weights=...) jnp program: batch losses AND both
    full-split epoch evals use the weighted NLL."""
    data, x = cond_data
    rng = np.random.default_rng(7)
    w = rng.uniform(0.2, 3.0, size=data.x.shape[0]).astype(np.float32)

    def build():
        return df.Flow(df.flow_chain(
            df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                              hidden_dim_s=16, hidden_dim_t=16),
            df.normalization_layer(x, -1.0, 1.0),
        ), data)

    f_j, f_f = build(), build()
    df.train(f_j, data, epochs=4, batchsize=32, verbose=False,
             key=jax.random.key(3), weights=w, fused_kernel=False)
    df.train(f_f, data, epochs=4, batchsize=32, verbose=False,
             key=jax.random.key(3), weights=w, fused_kernel=True)
    np.testing.assert_allclose(f_j.train_loss, f_f.train_loss, atol=ATOL)
    np.testing.assert_allclose(f_j.valid_loss, f_f.valid_loss, atol=ATOL)
    for a, b in zip(jax.tree_util.tree_leaves(f_j.model),
                    jax.tree_util.tree_leaves(f_f.model)):
        if a.size:
            np.testing.assert_allclose(a, b, atol=ATOL)

    # uniform weights reproduce the unweighted kernel run exactly
    f_u, f_1 = build(), build()
    df.train(f_u, data, epochs=3, batchsize=32, verbose=False,
             key=jax.random.key(5), fused_kernel=True)
    df.train(f_1, data, epochs=3, batchsize=32, verbose=False,
             key=jax.random.key(5), fused_kernel=True,
             weights=np.ones(data.x.shape[0], np.float32))
    np.testing.assert_allclose(f_u.train_loss, f_1.train_loss, atol=1e-6)


def test_skip_nonfinite_parity():
    """In-kernel non-finite guard == train(skip_nonfinite=True): NaN rows
    poison exactly the batches that gather them; both paths must skip
    the same updates, keep identical finite params, and advance the
    Adam count only on applied steps. The fixture is shared with
    bench.py's hardware gate (bench.guard_parity_case) so this CPU test
    and the on-hardware gate can never drift apart."""
    import bench

    data, build = bench.guard_parity_case(jax, df)
    f_j, f_f = build(), build()
    os_j = df.train(f_j, data, epochs=4, batchsize=16, verbose=False,
                    key=jax.random.key(3), skip_nonfinite=True,
                    fused_kernel=False)
    os_f = df.train(f_f, data, epochs=4, batchsize=16, verbose=False,
                    key=jax.random.key(3), skip_nonfinite=True,
                    fused_kernel=True)
    assert f_j.skipped_updates == f_f.skipped_updates
    assert sum(f_f.skipped_updates) > 0
    assert int(os_j[0].count) == int(os_f[0].count)
    n_batches = -(-len(data.partition.training) // 16)
    assert int(os_f[0].count) == 4 * n_batches - sum(f_f.skipped_updates)
    for a, b in zip(jax.tree_util.tree_leaves(f_j.model),
                    jax.tree_util.tree_leaves(f_f.model)):
        if a.size:
            assert np.all(np.isfinite(np.asarray(a)))
            np.testing.assert_allclose(a, b, atol=ATOL)
    # full-split evals include the NaN rows → NaN histories, identically
    np.testing.assert_allclose(f_j.train_loss, f_f.train_loss, atol=ATOL)


def test_skip_nonfinite_noop_on_healthy_kernel_run(cond_data):
    """A healthy guarded kernel run counts zero skips and reproduces the
    unguarded kernel run exactly."""
    data, x = cond_data

    def build():
        return df.Flow(df.flow_chain(
            df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                              hidden_dim_s=16, hidden_dim_t=16),
            df.normalization_layer(x, -1.0, 1.0),
        ), data)

    f_g, f_u = build(), build()
    df.train(f_g, data, epochs=3, batchsize=32, verbose=False,
             key=jax.random.key(4), skip_nonfinite=True, fused_kernel=True)
    df.train(f_u, data, epochs=3, batchsize=32, verbose=False,
             key=jax.random.key(4), fused_kernel=True)
    assert f_g.skipped_updates == [0, 0, 0]
    np.testing.assert_allclose(f_g.train_loss, f_u.train_loss, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(f_g.model),
                    jax.tree_util.tree_leaves(f_u.model)):
        if a.size:
            np.testing.assert_allclose(a, b, atol=1e-6)


def test_metrics_log_on_fused_path(cond_data, tmp_path):
    """metrics_log is host-side bookkeeping of the returned histories —
    it must not force the jnp program (r4 surface growth)."""
    import json

    data, x = cond_data
    flow = df.Flow(df.flow_chain(
        df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                          hidden_dim_s=8, hidden_dim_t=8),
        df.normalization_layer(x, -1.0, 1.0),
    ), data)
    p = tmp_path / "metrics.jsonl"
    df.train(flow, data, epochs=3, batchsize=32, verbose=False,
             key=jax.random.key(1), fused_kernel=True, metrics_log=str(p))
    lines = [json.loads(line) for line in open(p)]
    assert len(lines) == 3
    assert lines[-1]["epoch"] == 3
    np.testing.assert_allclose([ln["valid_nll"] for ln in lines],
                               flow.valid_loss, atol=1e-6)


def test_tagged_adam_kernel_parity(cond_data):
    """df.adam(lr, b1, b2, eps) carries introspectable hyperparameters:
    the kernel honors them and matches optax.adam on the jnp program."""
    import optax

    data, x = cond_data

    def build():
        return df.Flow(df.flow_chain(
            df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                              hidden_dim_s=16, hidden_dim_t=16),
            df.normalization_layer(x, -1.0, 1.0),
        ), data)

    f_j, f_f = build(), build()
    df.train(f_j, data, optax.adam(3e-3, b1=0.85), epochs=4, batchsize=32,
             verbose=False, key=jax.random.key(3), fused_kernel=False)
    df.train(f_f, data, df.adam(3e-3, b1=0.85), epochs=4, batchsize=32,
             verbose=False, key=jax.random.key(3), fused_kernel=True)
    np.testing.assert_allclose(f_j.train_loss, f_f.train_loss, atol=ATOL)
    np.testing.assert_allclose(f_j.valid_loss, f_f.valid_loss, atol=ATOL)
    for a, b in zip(jax.tree_util.tree_leaves(f_j.model),
                    jax.tree_util.tree_leaves(f_f.model)):
        if a.size:
            np.testing.assert_allclose(a, b, atol=ATOL)

    # the tagged Adam also works on the jnp program (duck-typed optax)
    f_d = build()
    df.train(f_d, data, df.adam(3e-3, b1=0.85), epochs=4, batchsize=32,
             verbose=False, key=jax.random.key(3), fused_kernel=False)
    np.testing.assert_allclose(f_d.train_loss, f_j.train_loss, atol=1e-6)


def test_tagged_adam_auto_routes(cond_data, monkeypatch):
    """auto mode attempts the kernel for df.adam(...) but not for an
    opaque optax optimizer; skip_nonfinite/metrics_log no longer force
    the jnp program."""
    import densityflows_tpu.models.fused_train as ft

    data, x = cond_data

    def build():
        return df.Flow(df.flow_chain(
            df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                              hidden_dim_s=8, hidden_dim_t=8),
            df.normalization_layer(x, -1.0, 1.0),
        ), data)

    calls = []

    def fake_train_fused(*a, **k):
        calls.append(k)
        raise ft.UnsupportedFusedTrain("probe: force jnp fallback")

    monkeypatch.setattr(ft, "train_fused", fake_train_fused)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    flow = build()
    df.train(flow, data, df.adam(2e-3), epochs=1, verbose=False,
             key=jax.random.key(1))
    assert len(calls) == 1 and calls[-1]["lr"] == 2e-3

    df.train(flow, data, epochs=1, verbose=False, key=jax.random.key(1),
             skip_nonfinite=True)
    assert len(calls) == 2 and calls[-1]["skip_nonfinite"] is True

    import optax

    df.train(flow, data, optax.adam(2e-3), epochs=1, verbose=False,
             key=jax.random.key(1))
    assert len(calls) == 2  # opaque optimizer: kernel not attempted


def test_permutation_folding_parity(cond_data):
    """PermutationLayers fold away into the downstream couplings' index
    maps (the kernel never permutes; a trailing frame change is free
    under the permutation-symmetric StandardNormal base) — parity with
    the jnp program everywhere a permutation can sit, including before
    a NormalizationLayer (whose constants must relabel too)."""
    data, x = cond_data
    ks = jax.random.split(jax.random.key(0), 4)
    chains = {
        # the standard use: mixing dims between couplings
        "between": lambda d, xx: df.flow_chain(
            df.coupling_layer(d, [0, 1, 2], key=ks[0], hidden_dim_s=12,
                              hidden_dim_t=12),
            df.permutation_layer([4, 2, 0, 3, 1]),
            df.coupling_layer(d, [0, 1, 2], key=ks[1], hidden_dim_s=12,
                              hidden_dim_t=12),
            df.normalization_layer(xx, -1.0, 1.0),
        ),
        # trailing frame change (first in the forward chain) + a norm
        # layer AFTER the permutation in inverse order
        "norm_after_perm": lambda d, xx: df.flow_chain(
            df.coupling_layer(d, [1, 3, 4], key=ks[2], hidden_dim_s=12,
                              hidden_dim_t=12),
            df.normalization_layer(xx, -1.0, 1.0),
            df.permutation_layer([1, 0, 4, 3, 2]),
            df.coupling_layer(d, [0, 2, 4], key=ks[3], hidden_dim_s=12,
                              hidden_dim_t=12),
        ),
        # two stacked permutations compose
        "stacked": lambda d, xx: df.flow_chain(
            df.coupling_layer(d, [0, 1, 2], key=ks[0], hidden_dim_s=12,
                              hidden_dim_t=12),
            df.permutation_layer([4, 3, 2, 1, 0]),
            df.permutation_layer([2, 0, 1, 4, 3]),
            df.coupling_layer(d, [0, 1, 2], key=ks[1],
                              joint_conditioner=True, hidden_dim_s=12,
                              hidden_dim_t=12),
        ),
    }
    for name, fn in chains.items():
        f_j, f_f, os_j, os_f = _parity(data, x, fn, epochs=3)
        # continuation through fold_state (opt_state folding uses the
        # same coordinate maps)
        df.train(f_f, data, opt_state=os_f, epochs=2, batchsize=32,
                 verbose=False, key=jax.random.key(8), fused_kernel=True)
        df.train(f_j, data, opt_state=os_j, epochs=2, batchsize=32,
                 verbose=False, key=jax.random.key(8), fused_kernel=False)
        np.testing.assert_allclose(f_j.valid_loss, f_f.valid_loss,
                                   atol=ATOL, err_msg=name)


def test_actnorm_parity(cond_data):
    """Trainable ActNorm rides the kernel as its own "anorm" op (two
    (1, d) params, value-based backward incl. the Σs ldj coupling) —
    parity with the jnp program, params must actually move, and the
    coordinate-map relabeling composes with permutations."""
    data, x = cond_data
    ks = jax.random.split(jax.random.key(0), 2)
    chains = {
        "between": lambda d, xx: df.flow_chain(
            df.coupling_layer(d, [0, 1, 2], key=ks[0], hidden_dim_s=12,
                              hidden_dim_t=12),
            df.actnorm_layer(xx),
            df.coupling_layer(d, [2, 3, 4], key=ks[1], hidden_dim_s=12,
                              hidden_dim_t=12),
            df.normalization_layer(xx, -1.0, 1.0),
        ),
        "perm_then_actnorm": lambda d, xx: df.flow_chain(
            df.coupling_layer(d, [0, 1, 2], key=ks[0], hidden_dim_s=12,
                              hidden_dim_t=12),
            df.permutation_layer([3, 1, 4, 0, 2]),
            df.actnorm_layer(xx),
            df.coupling_layer(d, [1, 2, 3], key=ks[1],
                              joint_conditioner=True, hidden_dim_s=12,
                              hidden_dim_t=12),
        ),
    }
    for name, fn in chains.items():
        f_j, f_f, os_j, os_f = _parity(data, x, fn, epochs=3)
        # the ActNorm params moved (they are real optimizer leaves)
        an_orig = [l for l in fn(data, x).layers
                   if type(l).__name__ == "ActNormLayer"][0]
        an_new = [l for l in f_f.model.layers
                  if type(l).__name__ == "ActNormLayer"][0]
        assert not np.allclose(np.asarray(an_orig.log_scale),
                               np.asarray(an_new.log_scale)), name
        # continuation: Adam moments for ActNorm leaves fold/unfold
        df.train(f_f, data, opt_state=os_f, epochs=2, batchsize=32,
                 verbose=False, key=jax.random.key(9), fused_kernel=True)
        df.train(f_j, data, opt_state=os_j, epochs=2, batchsize=32,
                 verbose=False, key=jax.random.key(9), fused_kernel=False)
        np.testing.assert_allclose(f_j.valid_loss, f_f.valid_loss,
                                   atol=ATOL, err_msg=name)


def test_fallback_visibility(cond_data, monkeypatch, capsys):
    """train() records which path ran (flow.trained_path) and why the
    fused kernel declined (flow.fused_decline_reason); under verbose=True
    the decline notice names the blocking item (VERDICT r4 item 7)."""
    import densityflows_tpu.models.fused_train as ft

    data, x = cond_data

    def build():
        return df.Flow(df.flow_chain(
            df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                              hidden_dim_s=8, hidden_dim_t=8),
            df.normalization_layer(x, -1.0, 1.0),
        ), data)

    # CPU rig: jnp path; the reason records the backend, nothing printed
    flow = build()
    df.train(flow, data, epochs=1, verbose=False, key=jax.random.key(1))
    assert flow.trained_path == "jnp"
    assert "non-TPU backend" in flow.fused_decline_reason
    assert "fused-train kernel" not in capsys.readouterr().out

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    # blocked surface flag: reason names it, verbose prints exactly once
    flow = build()
    df.train(flow, data, epochs=1, verbose=True, key=jax.random.key(1),
             mixed_precision=True)
    assert flow.trained_path == "jnp"
    assert "mixed_precision" in flow.fused_decline_reason
    out = capsys.readouterr().out
    assert out.count("fused-train kernel not used") == 1
    assert "mixed_precision" in out

    # non-verbose surface decline: recorded, not printed
    flow = build()
    df.train(flow, data, epochs=1, verbose=False, key=jax.random.key(1),
             mixed_precision=True)
    assert "mixed_precision" in flow.fused_decline_reason
    assert "fused-train kernel" not in capsys.readouterr().out

    # envelope decline: the UnsupportedFusedTrain message is the reason
    def fake(*a, **k):
        raise ft.UnsupportedFusedTrain("pre-gathered batch slab ~9.9 GB "
                                       "(probe)")

    monkeypatch.setattr(ft, "train_fused", fake)
    flow = build()
    df.train(flow, data, epochs=1, verbose=True, key=jax.random.key(1))
    assert flow.trained_path == "jnp"
    assert "slab" in flow.fused_decline_reason
    assert "slab" in capsys.readouterr().out

    # successful kernel run: path recorded, reason cleared
    def ok(fl, *a, **k):
        fl.train_loss.append(1.0)
        fl.valid_loss.append(1.0)
        return None

    monkeypatch.setattr(ft, "train_fused", ok)
    flow = build()
    flow.fused_decline_reason = "stale"
    df.train(flow, data, epochs=1, verbose=False, key=jax.random.key(1))
    assert flow.trained_path == "fused"
    assert flow.fused_decline_reason is None


def test_surface_parity_gate_interpret():
    """bench.fused_surface_parity_gate (the composite kernel-surface
    hardware gate: coupling -> permutation -> ActNorm -> clamped joint
    coupling -> normalization with df.adam(3e-3, b1=0.85), weights, and
    track_best) passes in interpret mode, and a deliberate per-step
    numeric perturbation in the fused path trips the strict epoch-1
    tolerance — proving the gate can actually fail (VERDICT r4 item 2)."""
    import bench

    out = bench.fused_surface_parity_gate(jax, df, epochs=4)
    assert out["fused_surface_parity_max_err"] <= 1e-3
    assert out["fused_surface_history_max_err"] <= 0.1

    class SkewedDF:
        """df proxy whose fused-path train() runs a 30%-off Adam lr —
        the stand-in for a systematic in-kernel numeric bug."""

        def __getattr__(self, name):
            return getattr(df, name)

        @staticmethod
        def train(flow, data, optimizer=None, *a, **k):
            if k.get("fused_kernel") and optimizer is not None:
                optimizer = df.adam(optimizer.learning_rate * 1.3,
                                    b1=optimizer.b1, b2=optimizer.b2,
                                    eps=optimizer.eps)
            return df.train(flow, data, optimizer, *a, **k)

    with pytest.raises(RuntimeError, match="epoch-1"):
        bench.fused_surface_parity_gate(jax, SkewedDF(), epochs=4)


# -- streaming kernel (per-batch HBM blocks; r5) ------------------------------


def _force_stream(monkeypatch):
    """Make the resident envelope always fail so train_fused routes to
    the streaming kernel at test-sized configs."""
    import densityflows_tpu.models.fused_train as ft

    def always_raise(*a, **k):
        raise ft.UnsupportedFusedTrain("probe: force stream")

    monkeypatch.setattr(ft, "_check_budget", always_raise)
    return ft


def test_stream_kernel_matches_jnp(cond_data, monkeypatch):
    """The streaming kernel (per-batch blocks, out-of-kernel snapshot
    evals) == the jnp program: histories, params, Adam count — with
    importance weights and a joint/clamped layer riding along."""
    ft = _force_stream(monkeypatch)
    data, x = cond_data
    rng = np.random.default_rng(7)
    w = rng.uniform(0.2, 3.0, size=data.x.shape[0]).astype(np.float32)

    def build():
        return df.Flow(df.flow_chain(
            df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                              hidden_dim_s=8, hidden_dim_t=8),
            df.coupling_layer(data, [2, 3, 4], key=jax.random.key(1),
                              joint_conditioner=True, hidden_dim_s=8,
                              hidden_dim_t=8, max_log_scale=3.0),
            df.normalization_layer(x, -1.0, 1.0),
        ), data)

    f_j = build()
    os_j = df.train(f_j, data, epochs=5, batchsize=32, verbose=False,
                    key=jax.random.key(5), weights=w, fused_kernel=False)
    f_s = build()
    os_s = ft.train_fused(f_s, data, epochs=5, batchsize=32,
                          verbose=False, key=jax.random.key(5), weights=w)
    assert f_s.fused_kernel_mode == "stream"
    np.testing.assert_allclose(f_j.train_loss, f_s.train_loss, atol=ATOL)
    np.testing.assert_allclose(f_j.valid_loss, f_s.valid_loss, atol=ATOL)
    assert int(os_j[0].count) == int(os_s[0].count)
    for a, b in zip(jax.tree_util.tree_leaves(f_j.model),
                    jax.tree_util.tree_leaves(f_s.model)):
        if a.size:
            np.testing.assert_allclose(a, b, atol=ATOL)


def test_stream_kernel_guard_and_chunks(monkeypatch):
    """Streaming + non-finite guard + multi-chunk epochs: skip counts,
    Adam count carry, and params match the jnp skip_nonfinite program."""
    import bench

    ft = _force_stream(monkeypatch)
    data, build = bench.guard_parity_case(jax, df)
    f_j, f_s = build(), build()
    os_j = df.train(f_j, data, epochs=6, batchsize=16, verbose=False,
                    key=jax.random.key(3), skip_nonfinite=True,
                    fused_kernel=False)
    # 2 epochs per chunk: slab+snap budget shrunk under one chunk of 3
    nb = -(-len(data.partition.training) // 16)
    slab_pe = nb * 16 * 4 * 4
    from densityflows_tpu.models.fused_train import chain_train_fold
    tparams = chain_train_fold(f_s.model)[2]
    snap_pe = sum(int(np.prod(p.shape)) for p in tparams) * 4
    monkeypatch.setattr(ft, "_HBM_SLAB_BUDGET", 2 * (slab_pe + snap_pe))
    os_s = ft.train_fused(f_s, data, epochs=6, batchsize=16,
                          verbose=False, key=jax.random.key(3),
                          skip_nonfinite=True)
    assert f_s.fused_kernel_mode == "stream"
    assert f_j.skipped_updates == f_s.skipped_updates
    assert sum(f_s.skipped_updates) > 0
    assert int(os_j[0].count) == int(os_s[0].count)
    for a, b in zip(jax.tree_util.tree_leaves(f_j.model),
                    jax.tree_util.tree_leaves(f_s.model)):
        if a.size:
            np.testing.assert_allclose(a, b, atol=ATOL)


def test_stream_kernel_track_best(cond_data, monkeypatch):
    """Streaming track_best: the selected snapshot equals the jnp
    program's best model, across chunk boundaries."""
    ft = _force_stream(monkeypatch)
    data, x = cond_data

    def build():
        return df.Flow(df.flow_chain(
            df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                              hidden_dim_s=8, hidden_dim_t=8),
            df.normalization_layer(x, -1.0, 1.0),
        ), data)

    f_j, f_s = build(), build()
    _, best_j = df.train(f_j, data, epochs=6, batchsize=32, verbose=False,
                         key=jax.random.key(4), _track_best=True,
                         fused_kernel=False)
    _, best_s = ft.train_fused(f_s, data, epochs=6, batchsize=32,
                               verbose=False, key=jax.random.key(4),
                               track_best=True)
    assert np.argmin(f_j.valid_loss) == np.argmin(f_s.valid_loss)
    for a, b in zip(jax.tree_util.tree_leaves(best_j),
                    jax.tree_util.tree_leaves(best_s)):
        if a.size:
            np.testing.assert_allclose(a, b, atol=ATOL)


# -- mesh DP fused-step program (r5) ------------------------------------------


def test_fused_step_mesh_matches_jnp(cond_data, monkeypatch):
    """train(mesh=...) auto-routes through the grads-only step kernel
    (shard_map + grad psum + folded Adam) inside its envelope and must
    match the GSPMD jnp program: histories, params, Adam count — with
    weights and the guard riding along."""
    from densityflows_tpu.parallel.mesh import make_mesh

    data, x = cond_data
    rng = np.random.default_rng(9)
    w = rng.uniform(0.3, 2.0, size=data.x.shape[0]).astype(np.float32)
    mesh = make_mesh()

    def build():
        return df.Flow(df.flow_chain(
            df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                              hidden_dim_s=8, hidden_dim_t=8),
            df.coupling_layer(data, [2, 3, 4], key=jax.random.key(1),
                              joint_conditioner=True, hidden_dim_s=8,
                              hidden_dim_t=8),
            df.normalization_layer(x, -1.0, 1.0),
        ), data)

    kw = dict(epochs=4, batchsize=32, verbose=False,
              key=jax.random.key(5), mesh=mesh, weights=w)
    f_j = build()
    os_j = df.train(f_j, data, df.adam(2e-3), **kw)
    assert f_j.trained_path == "jnp"  # CPU rig: step path not routed

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    f_s = build()
    os_s = df.train(f_s, data, df.adam(2e-3), **kw)
    assert f_s.trained_path == "fused-step-mesh"
    np.testing.assert_allclose(f_j.train_loss, f_s.train_loss, atol=ATOL)
    np.testing.assert_allclose(f_j.valid_loss, f_s.valid_loss, atol=ATOL)
    assert int(os_j[0].count) == int(os_s[0].count)
    for a, b in zip(jax.tree_util.tree_leaves(f_j.model),
                    jax.tree_util.tree_leaves(f_s.model)):
        if a.size:
            np.testing.assert_allclose(a, b, atol=ATOL)

    # continuation: a jnp-mesh opt_state feeds the step program exactly.
    # train() donates the opt_state on both paths, so each continuation
    # gets its own copy
    def copy_state(s):
        return jax.tree_util.tree_map(lambda a: jax.numpy.array(a), s)

    os_a, os_b = copy_state(os_j), copy_state(os_j)
    df.train(f_s, data, df.adam(2e-3), opt_state=os_a, epochs=2,
             batchsize=32, verbose=False, key=jax.random.key(6),
             mesh=mesh, weights=w)
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    df.train(f_j, data, df.adam(2e-3), opt_state=os_b, epochs=2,
             batchsize=32, verbose=False, key=jax.random.key(6),
             mesh=mesh, weights=w)
    np.testing.assert_allclose(f_j.valid_loss, f_s.valid_loss, atol=ATOL)


def test_fused_step_mesh_envelope_declines(cond_data, monkeypatch, capsys):
    """Outside the measured envelope (wide conditioners, indivisible
    batch) the mesh path declines with a recorded reason and runs the
    GSPMD jnp program."""
    from densityflows_tpu.parallel.mesh import make_mesh

    data, x = cond_data
    mesh = make_mesh()
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    # wide conditioners: width > 64
    flow = df.Flow(df.flow_chain(
        df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                          hidden_dim_s=128, hidden_dim_t=128),
        df.normalization_layer(x, -1.0, 1.0),
    ), data)
    df.train(flow, data, df.adam(1e-3), epochs=1, batchsize=32,
             verbose=True, key=jax.random.key(1), mesh=mesh)
    assert flow.trained_path == "jnp"
    assert "width" in flow.fused_decline_reason
    assert "mesh fused-step" in capsys.readouterr().out

    # batch not divisible by the data axis
    flow2 = df.Flow(df.flow_chain(
        df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                          hidden_dim_s=8, hidden_dim_t=8),
        df.normalization_layer(x, -1.0, 1.0),
    ), data)
    df.train(flow2, data, df.adam(1e-3), epochs=1, batchsize=30,
             verbose=False, key=jax.random.key(1), mesh=mesh)
    assert flow2.trained_path == "jnp"
    assert "divisible" in flow2.fused_decline_reason
