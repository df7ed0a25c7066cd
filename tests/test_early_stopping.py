"""Early-stopping (chunked fused-program) tests."""

import numpy as np
import jax
import pytest

import densityflows_tpu as df


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.normal(size=(400, 3)) * np.array([1.0, 0.5, 2.0])).astype(np.float32)
    data = df.DataArrays.make(x, rng=0)
    chain = df.flow_chain(
        df.coupling_layer(data, [0, 1], key=jax.random.key(0)),
        df.coupling_layer(data, [1, 2], key=jax.random.key(1)),
        df.normalization_layer(x, -1.0, 1.0),
    )
    return df.Flow(chain, data), data


def test_early_stopping_stops_before_budget():
    flow, data = _setup()
    # tiny dataset: valid NLL plateaus fast; a huge epoch budget with a
    # small patience must cut the run short
    df.train(
        flow, data, epochs=400, verbose=False, key=jax.random.key(2),
        early_stopping_patience=8, early_stopping_check_every=4,
    )
    assert len(flow.training_loss) < 400
    assert len(flow.training_loss) == len(flow.validation_loss)
    assert np.all(np.isfinite(flow.training_loss))


def test_early_stopping_restores_best_model():
    flow, data = _setup(1)
    df.train(
        flow, data, epochs=200, verbose=False, key=jax.random.key(3),
        early_stopping_patience=10, early_stopping_check_every=5,
        early_stopping_min_delta=1e-4,
    )
    # the restored model must score (near-)best validation NLL, not the
    # last epoch's
    vl = df.evaluate(flow, data, "validation")
    assert vl <= min(flow.validation_loss) + 5e-2
    # restored model is live (not donated away): sampling works
    s = np.asarray(flow.sample((200,), key=jax.random.key(4)))
    assert s.shape == (200, 3) and np.isfinite(s).all()


def test_early_stopping_runs_full_budget_when_improving():
    flow, data = _setup(2)
    # patience larger than the budget: must never trigger
    df.train(
        flow, data, epochs=12, verbose=False, key=jax.random.key(5),
        early_stopping_patience=100, early_stopping_check_every=6,
        restore_best=False,
    )
    assert len(flow.training_loss) == 12


def test_early_stopping_excludes_checkpoint_dir(tmp_path):
    flow, data = _setup(3)
    with pytest.raises(ValueError):
        df.train(
            flow, data, epochs=10, verbose=False,
            early_stopping_patience=5, checkpoint_dir=str(tmp_path / "c"),
        )
