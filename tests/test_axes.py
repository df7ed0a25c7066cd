"""CouplingAxes tests (mirrors reference test/runtests.jl:33-41 'axes').

Note the index-base flip: the reference's 1-based mask [4,5,6,7] for d=7
is the 0-based mask [3,4,5,6] here.
"""

import numpy as np
import pytest

import densityflows_tpu as df
from densityflows_tpu.axes import coupling_axes, is_reverse


def test_constructor_equivalences():
    data = df.DataArrays.make(
        np.ones((10, 7), np.float32), np.ones((10, 2), np.float32), rng=0
    )
    ref = coupling_axes(7, 3, n=2)
    assert coupling_axes(7, [3, 4, 5, 6], n=2) == ref
    assert coupling_axes(data.num_dimensions, n=data.num_conditions) == ref
    assert coupling_axes(7, [3, 4, 5, 6], n=2) == ref
    assert coupling_axes(7, 3, n=2, reverse=False) == ref


def test_axis_nn_rule():
    # axis_nn = conditions first, then identity dims shifted by n
    # (reference src/Axes.jl:90-98)
    ax = coupling_axes(5, [0, 2], n=2)
    assert ax.axis_id == (1, 3, 4)
    assert ax.axis_af == (0, 2)
    assert ax.axis_nn == (0, 1, 3, 5, 6)


def test_reverse_swaps_and_is_reverse():
    ax = coupling_axes(7, [0, 2, 4], n=2)
    rev = ax.reverse()
    assert rev.axis_id == ax.axis_af
    assert rev.axis_af == ax.axis_id
    assert is_reverse(ax, rev)
    assert not is_reverse(ax, ax)


def test_split_point_semantics():
    # reverse=False: identity on first j dims, transform on the rest
    ax = coupling_axes(6, 2, n=0)
    assert ax.axis_id == (0, 1)
    assert ax.axis_af == (2, 3, 4, 5)
    # reverse=True: transform on first j dims
    axr = coupling_axes(6, 2, n=0, reverse=True)
    assert axr.axis_af == (0, 1)
    assert axr.axis_id == (2, 3, 4, 5)


def test_permutation_insensitive_equality():
    a = coupling_axes(5, [1, 3], n=1)
    b = coupling_axes(5, [3, 1], n=1)
    assert a == b
    assert hash(a) == hash(b)


def test_invalid_mask_raises():
    with pytest.raises(ValueError):
        coupling_axes(5, [5], n=0)  # out of range (0-based)
    with pytest.raises(ValueError):
        coupling_axes(5, [1, 1], n=0)  # duplicates
