"""Data-pipeline tests (mirrors reference test/runtests.jl:7-31 'data')."""

import numpy as np
import pytest

import densityflows_tpu as df


def test_dflt_theta_shapes():
    x = np.ones((10, 7), np.float32)
    th = df.dflt_theta(x)
    assert th.shape == (10, 0)
    assert th.dtype == np.float32
    assert df.dflt_theta((2, 3)).shape == (2, 3, 0)


def test_data_arrays_accessors():
    x = 0.2 * np.ones((10, 7), np.float32)
    th = 0.1 * np.ones((10, 2), np.float32)
    x[1, 0] = 0.3
    th[1, 0] = 0.4

    data = df.DataArrays.make(x, th, rng=0)
    meta = data.metadata()

    assert df.number_dimensions(data) == meta.d == 7
    assert df.number_conditions(data) == meta.n == 2
    np.testing.assert_allclose(meta.theta_min, [0.1, 0.1])
    np.testing.assert_allclose(meta.theta_max, [0.4, 0.1])


def test_normalized_training_data_in_unit_interval():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(100, 5)).astype(np.float32)
    th = rng.uniform(-3, 7, size=(100, 2)).astype(np.float32)
    data = df.DataArrays.make(x, th, rng=1)
    x_t, th_t = data.normalized_training_data(data.metadata())
    assert th_t.min() >= 0.0 and th_t.max() <= 1.0
    # x passes through un-normalized (only θ is normalized at the boundary)
    np.testing.assert_array_equal(x_t, data.training_data()[0])


def test_zero_range_condition_maps_to_zero():
    th = np.full((10, 1), 3.0, np.float32)
    out = df.normalize_input(th, np.array([3.0], np.float32), np.array([3.0], np.float32))
    np.testing.assert_array_equal(out, np.zeros_like(th))


def test_partition_split_sizes_and_disjoint():
    part = df.DataPartition.make(100, 0.8, 0.1, rng=0)
    assert len(part.training) == 80
    assert len(part.validation) == 10
    assert len(part.testing) == 10
    all_idx = np.concatenate([part.training, part.validation, part.testing])
    assert sorted(all_idx.tolist()) == list(range(100))


def test_partition_deterministic_given_seed():
    p1 = df.DataPartition.make(50, rng=7)
    p2 = df.DataPartition.make(50, rng=7)
    np.testing.assert_array_equal(p1.training, p2.training)


def test_resize_output_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.uniform(2, 5, size=(20, 3)).astype(np.float32)
    lo, hi = x.min(axis=0), x.max(axis=0)
    y = df.normalize_input(x, lo, hi)
    back = df.resize_output(y, lo, hi)
    np.testing.assert_allclose(back, x, rtol=1e-5)


def test_batch_shape_mismatch_raises():
    with pytest.raises(ValueError):
        df.DataArrays.make(np.ones((10, 3)), np.ones((9, 2)))
