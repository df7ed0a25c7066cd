"""Coupling layers: RealNVP and NICE, plus the constructor family.

TPU-native counterpart of the reference layer structs and the
``CouplingLayer`` convenience-constructor family
(/root/reference/src/affine/RNVP.jl:41-48, /root/reference/src/affine/NICE.jl:31-36,
/root/reference/src/Layers.jl:110-158).

Layers are frozen pytree dataclasses: conditioner-MLP parameters are the
*data* leaves (trainable via ``jax.grad`` + optax), the
:class:`~densityflows_tpu.axes.CouplingAxes` is *static* aux data, so each
layer's masking pattern specializes the compiled program (SURVEY.md §7
"static shape/mask specialization").

Direction convention (SURVEY.md §2.4.4): ``forward`` = latent z → data x
(sampling), ``inverse`` = data x → latent z (density/training; the
reference calls this ``backward``). Both return ``(y, log_det_jac)`` with
per-sample ldj of batch shape. ``forward_`` is the ldj-free sampling fast
path (the reference's ``forward!``, src/affine/RNVP.jl:190-205) — in JAX
it is a pure function whose output buffer XLA reuses via donation in the
jitted sampling program.

Julia's ~20 ``CouplingLayer`` dispatch overloads collapse into one factory
function :func:`coupling_layer` with keyword arguments.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ..axes import CouplingAxes, coupling_axes
from ..ops.mlp import MLP, init_mlp, apply_mlp, count_params
from ..ops import coupling as C

__all__ = ["RNVPCouplingLayer", "NICECouplingLayer", "coupling_layer"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RNVPCouplingLayer:
    """Real-NVP affine coupling layer (reference src/affine/RNVP.jl:41-48).

    Trainable leaves: ``s_net``, ``t_net`` (the reference's
    ``Flux.@layer ... trainable=(s_net, t_net)``, RNVP.jl:51).
    """

    s_net: MLP
    t_net: MLP
    axes: CouplingAxes = dataclasses.field(metadata=dict(static=True))

    def _conditioner(self, y, theta):
        y_id, y_af = C.split_features(y, self.axes)
        h = C.nn_input(y_id, theta)
        return y_id, y_af, apply_mlp(self.s_net, h), apply_mlp(self.t_net, h)

    def forward(self, z, theta):
        """latent → data with ldj (reference ``forward``, RNVP.jl:168-187)."""
        z_id, z_af, s, t = self._conditioner(z, theta)
        x_af, ldj = C.rnvp_forward(s, t, z_af)
        return C.recombine_features(z_id, x_af, self.axes), ldj

    def inverse(self, x, theta):
        """data → latent with ldj (reference ``backward``, RNVP.jl:150-165)."""
        x_id, x_af, s, t = self._conditioner(x, theta)
        z_af, ldj = C.rnvp_backward(s, t, x_af)
        return C.recombine_features(x_id, z_af, self.axes), ldj

    def forward_(self, z, theta):
        """ldj-free sampling fast path (reference ``forward!``, RNVP.jl:190-205)."""
        z_id, z_af, s, t = self._conditioner(z, theta)
        return C.recombine_features(z_id, z_af * jnp.exp(s) + t, self.axes)

    def summarize(self) -> str:
        return (
            f"RNVPCouplingLayer | s_net > {list(self.s_net.dims)} "
            f"({count_params(self.s_net)} parameters)\n"
            f"                  | t_net > {list(self.t_net.dims)} "
            f"({count_params(self.t_net)} parameters)\n"
            f"                  | axes  > {self.axes.summarize()}"
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NICECouplingLayer:
    """NICE additive (volume-preserving) coupling layer
    (reference src/affine/NICE.jl:31-38; trainable leaf: ``t_net``)."""

    t_net: MLP
    axes: CouplingAxes = dataclasses.field(metadata=dict(static=True))

    def _conditioner(self, y, theta):
        y_id, y_af = C.split_features(y, self.axes)
        return y_id, y_af, apply_mlp(self.t_net, C.nn_input(y_id, theta))

    def forward(self, z, theta):
        z_id, z_af, t = self._conditioner(z, theta)
        x_af, ldj = C.nice_forward(t, z_af)
        return C.recombine_features(z_id, x_af, self.axes), ldj

    def inverse(self, x, theta):
        x_id, x_af, t = self._conditioner(x, theta)
        z_af, ldj = C.nice_backward(t, x_af)
        return C.recombine_features(x_id, z_af, self.axes), ldj

    def forward_(self, z, theta):
        z_id, z_af, t = self._conditioner(z, theta)
        return C.recombine_features(z_id, z_af + t, self.axes)

    def summarize(self) -> str:
        return (
            f"NICECouplingLayer | t_net > {list(self.t_net.dims)} "
            f"({count_params(self.t_net)} parameters)\n"
            f"                  | axes  > {self.axes.summarize()}"
        )


def coupling_layer(
    d_or_axes_or_data,
    mask: Sequence[int] | int | None = None,
    *,
    kind: type = RNVPCouplingLayer,
    n: int = 0,
    reverse: bool = False,
    key=None,
    n_sublayers_s: int = 2,
    n_sublayers_t: int = 2,
    hidden_dim_s: int = 32,
    hidden_dim_t: int = 32,
    activation_s: str = "relu",
    activation_t: str = "relu",
    bias: bool = True,
    dtype=jnp.float32,
):
    """Build a coupling layer with default conditioner MLPs.

    Collapses the reference ``CouplingLayer(...)`` overload family
    (src/Layers.jl:110-158) into one factory. The first argument is one of:

    - a :class:`CouplingAxes`,
    - an ``int`` dimension ``d`` (with ``mask`` = index list or split point,
      default ``d // 2``),
    - a :class:`~densityflows_tpu.data.DataArrays` (d and n inferred).

    Defaults match the reference: 2 sublayers, hidden 32, relu, bias on
    (src/Layers.jl:113-123). Conditioner input width =
    ``len(axis_nn)``, output width = ``len(axis_af)``
    (src/Layers.jl:126-127).
    """
    from ..data import DataArrays  # local import to avoid a cycle

    if isinstance(d_or_axes_or_data, CouplingAxes):
        axes = d_or_axes_or_data
    elif isinstance(d_or_axes_or_data, DataArrays):
        data = d_or_axes_or_data
        axes = coupling_axes(
            data.num_dimensions, mask, n=data.num_conditions, reverse=reverse
        )
    else:
        axes = coupling_axes(int(d_or_axes_or_data), mask, n=n, reverse=reverse)

    if key is None:
        key = jax.random.key(0)
    in_dim, out_dim = axes.nn_input_dim, axes.transform_dim
    k_s, k_t = jax.random.split(key)
    t_net = init_mlp(
        k_t, in_dim, out_dim, n_sublayers_t,
        hidden_dim=hidden_dim_t, activation=activation_t, bias=bias, dtype=dtype,
    )
    if kind is NICECouplingLayer:
        return NICECouplingLayer(t_net, axes)
    s_net = init_mlp(
        k_s, in_dim, out_dim, n_sublayers_s,
        hidden_dim=hidden_dim_s, activation=activation_s, bias=bias, dtype=dtype,
    )
    return RNVPCouplingLayer(s_net, t_net, axes)
