"""Checkpoint/restore tests (contract of reference src/Loading.jl:324-377,
plus exact optimizer-state resume the reference lacks)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import densityflows_tpu as df
from densityflows_tpu.utils.checkpoint import (
    load_element,
    load_flow,
    save_element,
    save_flow,
)


def _small_flow(tmp_seed=0):
    rng = np.random.default_rng(tmp_seed)
    x = rng.normal(size=(200, 4)).astype(np.float32)
    th = rng.uniform(0, 2, size=(200, 1)).astype(np.float32)
    data = df.DataArrays.make(x, th, rng=1)
    chain = df.flow_chain(
        df.coupling_block(data, [0, 2], key=jax.random.key(2), hidden_dim_s=8,
                          hidden_dim_t=8),
        df.normalization_layer(x, -1.0, 1.0),
    )
    return df.Flow(chain, data), data, x, th


def test_save_load_element_roundtrip(tmp_path):
    layer = df.coupling_layer(5, [0, 2], n=1, key=jax.random.key(0))
    save_element(str(tmp_path / "el"), layer)
    loaded = load_element(str(tmp_path / "el"))
    assert isinstance(loaded, df.RNVPCouplingLayer)
    assert loaded.axes == layer.axes
    for a, b in zip(
        jax.tree_util.tree_leaves(layer), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_save_load_flow_identical_densities(tmp_path):
    flow, data, x, th = _small_flow()
    df.train(flow, data, epochs=2, verbose=False, key=jax.random.key(3))
    save_flow(str(tmp_path / "flow"), flow)
    loaded = load_flow(str(tmp_path / "flow"))

    lp0 = np.asarray(flow.log_prob(x[:20], th[:20]))
    lp1 = np.asarray(loaded.log_prob(x[:20], th[:20]))
    np.testing.assert_array_equal(lp0, lp1)
    assert loaded.train_loss == flow.train_loss
    assert loaded.valid_loss == flow.valid_loss
    assert loaded.metadata.d == flow.metadata.d
    np.testing.assert_array_equal(loaded.metadata.theta_min, flow.metadata.theta_min)

    s0 = np.asarray(flow.sample(7, (1.0,), key=jax.random.key(4)))
    s1 = np.asarray(loaded.sample(7, (1.0,), key=jax.random.key(4)))
    np.testing.assert_array_equal(s0, s1)


def test_exact_resume_with_opt_state(tmp_path):
    """Training N epochs straight must equal training k, checkpointing with
    opt state, loading, and training N−k more — exact resume (SURVEY.md §5
    notes the reference cannot do this)."""
    optimizer = optax.adam(1e-3)

    flow_a, data, x, th = _small_flow()
    opt_a = df.train(flow_a, data, optimizer, epochs=2, verbose=False,
                     key=jax.random.key(10), shuffle=False)
    opt_a = df.train(flow_a, data, optimizer, opt_a, epochs=2, verbose=False,
                     key=jax.random.key(11), shuffle=False)

    flow_b, data_b, _, _ = _small_flow()
    opt_b = df.train(flow_b, data_b, optimizer, epochs=2, verbose=False,
                     key=jax.random.key(10), shuffle=False)
    save_flow(str(tmp_path / "ck"), flow_b, opt_b)
    flow_c, opt_c = load_flow(str(tmp_path / "ck"), optimizer)
    df.train(flow_c, data_b, optimizer, opt_c, epochs=2, verbose=False,
             key=jax.random.key(11), shuffle=False)

    np.testing.assert_allclose(
        np.asarray(flow_a.log_prob(x[:10], th[:10])),
        np.asarray(flow_c.log_prob(x[:10], th[:10])),
        atol=1e-6,
    )


def test_refuses_to_overwrite_without_erase(tmp_path):
    flow, *_ = _small_flow()
    save_flow(str(tmp_path / "f"), flow)
    with pytest.raises(FileExistsError):
        save_flow(str(tmp_path / "f"), flow)
    save_flow(str(tmp_path / "f"), flow, erase=True)  # explicit erase OK


def test_chain_of_blocks_and_nice_roundtrip(tmp_path):
    chain = df.flow_chain(
        df.coupling_block(6, [0, 1, 2], n=2, key=jax.random.key(5)),
        df.coupling_layer(6, [1, 3], n=2, kind=df.NICECouplingLayer,
                          key=jax.random.key(6)),
    )
    save_element(str(tmp_path / "c"), chain)
    loaded = load_element(str(tmp_path / "c"))
    assert isinstance(loaded[0], df.CouplingBlock)
    assert isinstance(loaded[1], df.NICECouplingLayer)
    z = jnp.asarray(np.random.default_rng(7).normal(size=(4, 6)).astype(np.float32))
    t = jnp.asarray(np.random.default_rng(8).normal(size=(4, 2)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(chain.forward(z, t)[0]), np.asarray(loaded.forward(z, t)[0])
    )


def test_orbax_flow_roundtrip(tmp_path):
    """Orbax-backed sharded checkpoint matches densities exactly and
    restores optimizer state."""
    import optax
    from densityflows_tpu.utils.orbax_ckpt import save_flow_orbax, load_flow_orbax

    rng = np.random.default_rng(0)
    x = rng.normal(size=(256, 4)).astype(np.float32)
    th = rng.uniform(size=(256, 1)).astype(np.float32)
    data = df.DataArrays.make(x, th, rng=0)
    chain = df.flow_chain(
        df.coupling_layer(data, [0, 1], key=jax.random.key(0),
                          hidden_dim_s=8, hidden_dim_t=8),
        df.normalization_layer(x, -1.0, 1.0),
    )
    flow = df.Flow(chain, data)
    opt = optax.adam(1e-3)
    opt_state = df.train(flow, data, opt, epochs=2, verbose=False,
                         key=jax.random.key(1))

    save_flow_orbax(str(tmp_path / "ckpt"), flow, opt_state)
    flow2, opt_state2 = load_flow_orbax(str(tmp_path / "ckpt"), opt)

    lp1 = np.asarray(flow.log_prob(x[:32], th[:32]))
    lp2 = np.asarray(flow2.log_prob(x[:32], th[:32]))
    np.testing.assert_array_equal(lp1, lp2)
    assert flow2.train_loss == flow.train_loss
    for a, b in zip(jax.tree_util.tree_leaves(opt_state),
                    jax.tree_util.tree_leaves(opt_state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_restore_with_sharding(tmp_path):
    """Restore places arrays with a caller-provided sharding."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from densityflows_tpu.parallel.mesh import make_mesh
    from densityflows_tpu.utils.orbax_ckpt import save_flow_orbax, load_flow_orbax

    rng = np.random.default_rng(1)
    x = rng.normal(size=(64, 4)).astype(np.float32)
    data = df.DataArrays.make(x, rng=0)
    chain = df.flow_chain(
        df.coupling_layer(data, [0, 1], key=jax.random.key(0),
                          hidden_dim_s=16, hidden_dim_t=16))
    flow = df.Flow(chain, data)
    save_flow_orbax(str(tmp_path / "ckpt"), flow)

    mesh = make_mesh()
    repl = NamedSharding(mesh, P())
    flow2 = load_flow_orbax(str(tmp_path / "ckpt"),
                            sharding_fn=lambda leaf: repl)
    leaf = jax.tree_util.tree_leaves(flow2.model)[0]
    assert len(leaf.sharding.device_set) == 8
    z1, l1 = flow.inverse(x)
    z2, l2 = flow2.inverse(x)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-6)


def test_train_checkpoint_restart_recovery(tmp_path):
    """Kill-and-resume: a run interrupted mid-way resumes from the last
    checkpoint and ends bit-identical to an uninterrupted run
    (checkpoint-restart recovery story, SURVEY.md §5)."""
    import optax

    rng = np.random.default_rng(0)
    x = rng.normal(size=(300, 3)).astype(np.float32)
    data = df.DataArrays.make(x, rng=0)

    def fresh_flow():
        chain = df.flow_chain(
            df.coupling_layer(3, [0, 1], key=jax.random.key(0),
                              hidden_dim_s=8, hidden_dim_t=8),
        )
        md = df.MetaData("", 3, 0, np.zeros(0, np.float32), np.zeros(0, np.float32))
        return df.Flow(jax.tree_util.tree_map(jnp.array, chain), md)

    opt = optax.adam(1e-3)
    key = jax.random.key(7)

    # uninterrupted chunked run: 6 epochs in chunks of 2
    flow_a = fresh_flow()
    df.train(flow_a, data, opt, epochs=6, verbose=False, key=key,
             checkpoint_dir=str(tmp_path / "a"), checkpoint_every=2)

    # interrupted run: stop after 4 epochs, then resume to 6
    flow_b = fresh_flow()
    df.train(flow_b, data, opt, epochs=4, verbose=False, key=key,
             checkpoint_dir=str(tmp_path / "b"), checkpoint_every=2)
    flow_b2 = fresh_flow()  # simulate a fresh process
    df.train(flow_b2, data, opt, epochs=6, verbose=False, key=key,
             checkpoint_dir=str(tmp_path / "b"), checkpoint_every=2,
             resume=True)

    assert len(flow_b2.train_loss) == 6
    np.testing.assert_allclose(flow_b2.train_loss, flow_a.train_loss, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(flow_a.model),
                    jax.tree_util.tree_leaves(flow_b2.model)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


# -- custom-layer extensibility (register_element) ---------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _ShiftLayer:
    """Toy custom FlowElement: x = z + shift (volume-preserving)."""

    shift: jax.Array

    def forward(self, z, theta):
        return z + self.shift, jnp.zeros(z.shape[:-1], jnp.float32)

    def inverse(self, x, theta):
        return x - self.shift, jnp.zeros(x.shape[:-1], jnp.float32)

    def forward_(self, z, theta):
        return z + self.shift


def test_custom_layer_roundtrips_after_registration(tmp_path):
    """A user-defined layer checkpoints like a built-in once registered —
    parity with the reference's any-struct reflection serializer
    (Loading.jl:124-186)."""
    df.register_element(
        _ShiftLayer,
        lambda el: {"d": int(el.shift.shape[0]),
                    "dtype": str(el.shift.dtype)},
        lambda s: _ShiftLayer(jnp.zeros((s["d"],), jnp.dtype(s["dtype"]))),
    )
    chain = df.flow_chain(
        df.coupling_layer(3, [0, 1], key=jax.random.key(0),
                          hidden_dim_s=8, hidden_dim_t=8),
        _ShiftLayer(jnp.asarray([1.0, -2.0, 0.5], jnp.float32)),
    )
    md = df.MetaData("", 3, 0, np.zeros(0, np.float32), np.zeros(0, np.float32))
    flow = df.Flow(chain, md)
    df.save_flow(str(tmp_path / "custom"), flow)
    loaded = df.load_flow(str(tmp_path / "custom"))
    x = np.random.default_rng(0).normal(size=(32, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(loaded.log_prob(x)), np.asarray(flow.log_prob(x)),
        rtol=1e-6,
    )
    shift = loaded.model.layers[-1].shift
    np.testing.assert_array_equal(np.asarray(shift), [1.0, -2.0, 0.5])


def test_unregistered_custom_layer_raises_helpfully(tmp_path):
    @jax.tree_util.register_dataclass
    @dataclasses.dataclass(frozen=True)
    class _Mystery:
        v: jax.Array

    with pytest.raises(TypeError, match="register_element"):
        df.save_element(str(tmp_path / "m"), _Mystery(jnp.zeros(2)))
