"""Coupling blocks: a pair of layers with complementary masks.

TPU-native counterpart of the reference ``CouplingBlock``
(/root/reference/src/Blocks.jl:64-161): two coupling layers whose axes are
exact complements, so every feature dim is transformed exactly once per
block (SURVEY.md §2.4.10). ``forward`` applies layer_1 then layer_2;
``inverse`` applies layer_2 then layer_1; ldjs add.
"""

from __future__ import annotations

import dataclasses

import jax

from ..axes import CouplingAxes, coupling_axes, is_reverse
from .layers import RNVPCouplingLayer, coupling_layer

__all__ = ["CouplingBlock", "coupling_block"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CouplingBlock:
    """Two complementary coupling layers (reference src/Blocks.jl:64-75)."""

    layer_1: object
    layer_2: object

    def __post_init__(self):
        if not is_reverse(self.layer_1.axes, self.layer_2.axes):
            raise ValueError(
                "layer_1 and layer_2 need to have complementary axes"
            )

    def __len__(self) -> int:
        return 2

    def forward(self, z, theta):
        y, ldj_1 = self.layer_1.forward(z, theta)
        x, ldj_2 = self.layer_2.forward(y, theta)
        return x, ldj_1 + ldj_2

    def inverse(self, x, theta):
        y, ldj_2 = self.layer_2.inverse(x, theta)
        z, ldj_1 = self.layer_1.inverse(y, theta)
        return z, ldj_1 + ldj_2

    def forward_(self, z, theta):
        return self.layer_2.forward_(self.layer_1.forward_(z, theta), theta)

    def summarize(self) -> str:
        return self.layer_1.summarize() + "\n" + self.layer_2.summarize()


def coupling_block(
    d_or_axes_or_data,
    mask=None,
    *,
    kind: type = RNVPCouplingLayer,
    n: int = 0,
    reverse: bool = False,
    key=None,
    **net_kwargs,
) -> CouplingBlock:
    """Build a block from one axes spec and its complement (reference
    src/Blocks.jl:88-120). Accepts the same first-argument forms as
    :func:`~densityflows_tpu.models.layers.coupling_layer`."""
    from ..data import DataArrays

    if isinstance(d_or_axes_or_data, CouplingAxes):
        first_axes = d_or_axes_or_data
    elif isinstance(d_or_axes_or_data, DataArrays):
        data = d_or_axes_or_data
        first_axes = coupling_axes(
            data.num_dimensions, mask, n=data.num_conditions, reverse=reverse
        )
    else:
        first_axes = coupling_axes(int(d_or_axes_or_data), mask, n=n, reverse=reverse)

    if key is None:
        key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    layer_1 = coupling_layer(first_axes, kind=kind, key=k1, **net_kwargs)
    layer_2 = coupling_layer(first_axes.reverse(), kind=kind, key=k2, **net_kwargs)
    return CouplingBlock(layer_1, layer_2)
