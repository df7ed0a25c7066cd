"""Checkpointing: declarative spec + arrays save/load for flows.

TPU-native counterpart of the reference persistence subsystem
(/root/reference/src/Loading.jl). The reference encodes structure in
directory/file names and rebuilds types by reflection
(Loading.jl:124-186); here the structure is a declarative JSON spec
(architecture, axes, activation names, static config) plus one ``.npz``
of parameter arrays in pytree-flatten order — same observable contract
(``save_flow(dir, flow)`` → ``load_flow(dir)`` returns an identical
flow with losses and base preserved, Loading.jl:324-377), none of the
filename reflection.

Improvement over the reference (SURVEY.md §5): optimizer state CAN be
checkpointed (``save_flow(..., opt_state=...)``), so mid-training resume
is exact, not lossy.
"""

from __future__ import annotations

import json
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from ..axes import CouplingAxes
from ..data import MetaData
from ..models.blocks import CouplingBlock
from ..models.chains import FlowChain
from ..models.distributions import (
    BoxUniform, DiagNormal, GaussianMixture, StandardNormal,
)
from ..models.flow import Flow
from ..models.layers import (
    JointRNVPCouplingLayer,
    NICECouplingLayer,
    RNVPCouplingLayer,
    RQSCouplingLayer,
)
from ..models.normalization import (
    LogitLayer, NormalizationLayer, PermutationLayer,
)
from ..models.autoregressive import IAFLayer, MAFLayer
from ..models.glow import ActNormLayer, InvertibleLinearLayer
from ..models.embedding import EmbeddedChain
from ..ops.made import MaskedMLP
from ..ops.mlp import MLP

__all__ = [
    "save_flow",
    "load_flow",
    "save_ensemble",
    "load_ensemble",
    "save_element",
    "load_element",
    "element_spec",
    "element_from_spec",
    "register_element",
]

_FORMAT_VERSION = 1


# -- extensible element registry --------------------------------------------

_TO_SPEC: dict[type, tuple[str, object]] = {}
_FROM_SPEC: dict[str, object] = {}


def register_element(cls, to_spec, from_spec, *, name: str | None = None):
    """Register a custom flow element for checkpointing.

    The reference serializes ANY user struct by field reflection
    (Loading.jl:124-186); here extensibility is explicit instead:

    - ``to_spec(el) -> dict`` returns a JSON-able structural description
      (no arrays — arrays travel separately in pytree-flatten order);
    - ``from_spec(spec) -> element`` rebuilds a SKELETON with the right
      pytree structure (leaf shapes/dtypes; values are overwritten).

    ``name`` defaults to ``cls.__name__`` and is the ``"type"`` tag in
    the spec. Built-in layers are registered through this same hook, so
    a user-defined layer checkpoints exactly like a built-in::

        register_element(MyLayer,
                         lambda el: {"d": el.d},
                         lambda s: MyLayer.init(s["d"]))
        save_flow(dir, flow_containing_my_layer)
    """
    name = name or cls.__name__
    _TO_SPEC[cls] = (name, to_spec)
    _FROM_SPEC[name] = from_spec


def element_spec(el) -> dict:
    """JSON-able structural description of a flow element (the analogue of
    the reference's ``save_element`` type/field encoding,
    Loading.jl:124-173). Dispatches through the :func:`register_element`
    registry — exact type only: an unregistered SUBCLASS of a registered
    element would otherwise be silently saved under the base tag and
    loaded back as the base class (wrong skeleton if the subclass adds
    pytree leaves), so it raises instead."""
    entry = _TO_SPEC.get(type(el))
    if entry is not None:
        name, fn = entry
        spec = dict(fn(el))
        spec["type"] = name
        return spec
    for klass in type(el).__mro__[1:]:
        if klass in _TO_SPEC:
            raise TypeError(
                f"{type(el).__name__} subclasses registered element "
                f"{klass.__name__} but is not registered itself — a "
                "checkpoint would save/load it as the base class. Register "
                "it with register_element(cls, to_spec, from_spec)."
            )
    raise TypeError(
        f"don't know how to checkpoint {type(el).__name__}; register it "
        "with register_element(cls, to_spec, from_spec)"
    )


def element_from_spec(spec: dict):
    """Rebuild a flow element skeleton (zero arrays) from its spec — the
    analogue of the reference's ``load_element`` type resolution
    (Loading.jl:176-307), without ``eval``/reflection."""
    t = spec["type"]
    fn = _FROM_SPEC.get(t)
    if fn is None:
        raise ValueError(
            f"unknown element type in checkpoint: {t} (custom layers must "
            "be register_element'd before loading)"
        )
    return fn(spec)


# -- built-in registrations --------------------------------------------------

def _axes_spec(axes: CouplingAxes) -> dict:
    return {
        "d": axes.d,
        "n": axes.n,
        "axis_id": list(axes.axis_id),
        "axis_af": list(axes.axis_af),
        "axis_nn": list(axes.axis_nn),
    }


def _axes_from_spec(s: dict) -> CouplingAxes:
    return CouplingAxes(
        s["d"], s["n"], tuple(s["axis_id"]), tuple(s["axis_af"]),
        tuple(s["axis_nn"]),
    )


register_element(
    MLP,
    lambda el: {
        "weight_shapes": [list(w.shape) for w in el.weights],
        "bias_shapes": [list(b.shape) for b in el.biases],
        "dtype": str(el.weights[0].dtype) if el.weights else "float32",
        "activation": el.activation,
    },
    lambda s: MLP(
        tuple(jnp.zeros(sh, jnp.dtype(s["dtype"])) for sh in s["weight_shapes"]),
        tuple(jnp.zeros(sh, jnp.dtype(s["dtype"])) for sh in s["bias_shapes"]),
        s["activation"],
    ),
)

def _made_descriptor_from_spec(s: dict) -> tuple:
    """Descriptor for a MaskedMLP spec. New specs store it directly
    (``"made"``); legacy (round-2) specs stored the full mask grids — for
    those, infer (d, n_cond, P) from the layer shapes by search and VERIFY
    the regenerated masks match the stored ones exactly."""
    from ..ops.made import made_masks

    if "made" in s:
        m = s["made"]
        return (int(m[0]), int(m[1]), int(m[2]), tuple(int(h) for h in m[3]))
    in_dim = s["weight_shapes"][0][0]
    out_dim = s["weight_shapes"][-1][1]
    hidden = tuple(int(sh[1]) for sh in s["weight_shapes"][:-1])
    stored = [np.asarray(m, np.float32) for m in s["masks"]]
    for p in range(1, out_dim + 1):
        if out_dim % p:
            continue
        d = out_dim // p
        n_cond = in_dim - d
        if n_cond < 0:
            continue
        rebuilt = made_masks(d, n_cond, p, hidden)
        if all(
            a.shape == b.shape and np.array_equal(a, b)
            for a, b in zip(rebuilt, stored)
        ):
            return (d, n_cond, p, hidden)
    raise ValueError(
        "legacy MaskedMLP checkpoint masks don't match any MADE descriptor"
    )


register_element(
    MaskedMLP,
    lambda el: {
        "weight_shapes": [list(w.shape) for w in el.weights],
        "bias_shapes": [list(b.shape) for b in el.biases],
        "made": [el.made[0], el.made[1], el.made[2], list(el.made[3])],
        "dtype": str(el.weights[0].dtype),
        "activation": el.activation,
    },
    lambda s: MaskedMLP(
        tuple(jnp.zeros(sh, jnp.dtype(s["dtype"])) for sh in s["weight_shapes"]),
        tuple(jnp.zeros(sh, jnp.dtype(s["dtype"])) for sh in s["bias_shapes"]),
        _made_descriptor_from_spec(s),
        s["activation"],
    ),
)

def _ar_spec(el):
    return {
        "net": element_spec(el.net),
        "d": int(el.d),
        "n": int(el.n),
        "max_log_scale": float(el.max_log_scale),
    }

register_element(
    MAFLayer, _ar_spec,
    lambda s: MAFLayer(element_from_spec(s["net"]), s["d"], s["n"],
                       s["max_log_scale"]),
)
register_element(
    IAFLayer, _ar_spec,
    lambda s: IAFLayer(element_from_spec(s["net"]), s["d"], s["n"],
                       s["max_log_scale"]),
)

register_element(
    RNVPCouplingLayer,
    lambda el: {
        "s_net": element_spec(el.s_net),
        "t_net": element_spec(el.t_net),
        "axes": _axes_spec(el.axes),
        "max_log_scale": float(el.max_log_scale),
    },
    lambda s: RNVPCouplingLayer(
        element_from_spec(s["s_net"]),
        element_from_spec(s["t_net"]),
        _axes_from_spec(s["axes"]),
        float(s.get("max_log_scale", 0.0)),  # pre-field ckpts
    ),
)

register_element(
    JointRNVPCouplingLayer,
    lambda el: {
        "st_net": element_spec(el.st_net),
        "axes": _axes_spec(el.axes),
        "max_log_scale": float(el.max_log_scale),
    },
    lambda s: JointRNVPCouplingLayer(
        element_from_spec(s["st_net"]),
        _axes_from_spec(s["axes"]),
        float(s.get("max_log_scale", 0.0)),
    ),
)

register_element(
    NICECouplingLayer,
    lambda el: {"t_net": element_spec(el.t_net), "axes": _axes_spec(el.axes)},
    lambda s: NICECouplingLayer(
        element_from_spec(s["t_net"]), _axes_from_spec(s["axes"])
    ),
)

register_element(
    RQSCouplingLayer,
    lambda el: {
        "p_net": element_spec(el.p_net),
        "axes": _axes_spec(el.axes),
        "n_bins": int(el.n_bins),
        "bound": float(el.bound),
    },
    lambda s: RQSCouplingLayer(
        element_from_spec(s["p_net"]), _axes_from_spec(s["axes"]),
        s["n_bins"], s["bound"],
    ),
)

def _norm_from_spec(s):
    dtype = jnp.dtype(s["dtype"])
    z = jnp.zeros((s["d"],), dtype)
    # skeleton x_max=1 keeps the zero-array skeleton valid (x_max > x_min)
    return NormalizationLayer(z, z + 1, s["alpha"], s["beta"])

register_element(
    NormalizationLayer,
    lambda el: {
        "d": int(el.x_min.shape[0]),
        "dtype": str(el.x_min.dtype),
        "alpha": float(el.alpha),
        "beta": float(el.beta),
    },
    _norm_from_spec,
)

register_element(
    PermutationLayer,
    lambda el: {"perm": list(el.perm)},
    lambda s: PermutationLayer(tuple(s["perm"])),
)

register_element(
    ActNormLayer,
    lambda el: {"d": int(el.bias.shape[0]), "dtype": str(el.bias.dtype)},
    lambda s: ActNormLayer(jnp.zeros((s["d"],), jnp.dtype(s["dtype"])),
                           jnp.zeros((s["d"],), jnp.dtype(s["dtype"]))),
)

register_element(
    InvertibleLinearLayer,
    lambda el: {
        "d": el.d,
        "dtype": str(el.log_s.dtype),
        "perm": list(el.perm),
        "sign": [float(v) for v in el.sign],
    },
    lambda s: InvertibleLinearLayer(
        jnp.zeros((s["d"], s["d"]), jnp.dtype(s["dtype"])),
        jnp.zeros((s["d"], s["d"]), jnp.dtype(s["dtype"])),
        jnp.zeros((s["d"],), jnp.dtype(s["dtype"])),
        tuple(s["perm"]), tuple(s["sign"]),
    ),
)

register_element(
    CouplingBlock,
    lambda el: {"layer_1": element_spec(el.layer_1),
                "layer_2": element_spec(el.layer_2)},
    lambda s: CouplingBlock(element_from_spec(s["layer_1"]),
                            element_from_spec(s["layer_2"])),
)

register_element(
    FlowChain,
    lambda el: {"layers": [element_spec(l) for l in el.layers]},
    lambda s: FlowChain(tuple(element_from_spec(v) for v in s["layers"])),
)

register_element(
    EmbeddedChain,
    lambda el: {"embed": element_spec(el.embed), "chain": element_spec(el.chain)},
    lambda s: EmbeddedChain(element_from_spec(s["embed"]),
                            element_from_spec(s["chain"])),
)

register_element(
    LogitLayer,
    lambda el: {"d": int(el.lo.shape[0]), "dtype": str(el.lo.dtype),
                "eps": float(el.eps)},
    lambda s: LogitLayer(jnp.zeros((s["d"],), jnp.dtype(s["dtype"])),
                         jnp.zeros((s["d"],), jnp.dtype(s["dtype"])) + 1,
                         s["eps"]),
)

register_element(
    StandardNormal,
    lambda el: {"d": el.d},
    lambda s: StandardNormal(s["d"]),
)

register_element(
    DiagNormal,
    lambda el: {"d": int(el.mean.shape[-1]), "dtype": str(el.mean.dtype)},
    lambda s: DiagNormal(jnp.zeros((s["d"],), jnp.dtype(s["dtype"])),
                         jnp.ones((s["d"],), jnp.dtype(s["dtype"]))),
)

register_element(
    GaussianMixture,
    lambda el: {"k": el.k, "d": el.d, "dtype": str(el.means.dtype)},
    lambda s: GaussianMixture(
        jnp.zeros((s["k"], s["d"]), jnp.dtype(s["dtype"])),
        jnp.ones((s["k"], s["d"]), jnp.dtype(s["dtype"])),
        jnp.zeros((s["k"],), jnp.dtype(s["dtype"])),
    ),
)

register_element(
    BoxUniform,
    lambda el: {"d": el.d, "dtype": str(el.lo.dtype)},
    lambda s: BoxUniform(jnp.zeros((s["d"],), jnp.dtype(s["dtype"])),
                         jnp.zeros((s["d"],), jnp.dtype(s["dtype"])) + 1),
)


# -- array (de)hydration ---------------------------------------------------

def _leaves_to_npz(tree) -> dict:
    leaves = jax.tree_util.tree_leaves(tree)
    return {f"leaf_{i:05d}": np.asarray(l) for i, l in enumerate(leaves)}


def _npz_into_tree(skeleton, npz) -> object:
    treedef = jax.tree_util.tree_structure(skeleton)
    n = treedef.num_leaves
    leaves = [jnp.asarray(npz[f"leaf_{i:05d}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


# -- element-level API (reference save_element/load_element) ---------------

def save_element(directory: str, el, *, erase: bool = False) -> None:
    """Persist one flow element (reference ``save_element``,
    Loading.jl:124-173)."""
    _prepare_dir(directory, erase)
    with open(os.path.join(directory, "spec.json"), "w") as f:
        json.dump({"format_version": _FORMAT_VERSION, "spec": element_spec(el)}, f, indent=1)
    np.savez(os.path.join(directory, "arrays.npz"), **_leaves_to_npz(el))


def load_element(directory: str):
    """Load one flow element (reference ``load_element``,
    Loading.jl:176-307)."""
    with open(os.path.join(directory, "spec.json")) as f:
        payload = json.load(f)
    skeleton = element_from_spec(payload["spec"])
    npz = np.load(os.path.join(directory, "arrays.npz"))
    return _npz_into_tree(skeleton, npz)


# -- flow-level API (reference save_flow/load_flow) ------------------------

def _prepare_dir(directory: str, erase: bool) -> None:
    if os.path.exists(directory):
        if erase:
            shutil.rmtree(directory)
        elif os.listdir(directory):
            raise FileExistsError(
                f"{directory} exists and is not empty (pass erase=True)"
            )
    os.makedirs(directory, exist_ok=True)


def save_flow(directory: str, flow: Flow, opt_state=None, *, erase: bool = False) -> None:
    """Persist a complete flow: model + base + metadata + loss histories
    (+ optionally optimizer state). Reference ``save_flow``
    (Loading.jl:324-345); opt-state persistence is our addition."""
    _prepare_dir(directory, erase)
    save_element(os.path.join(directory, "model"), flow.model, erase=erase)
    save_element(os.path.join(directory, "base"), flow.base, erase=erase)
    meta = {
        "format_version": _FORMAT_VERSION,
        "metadata": {
            "hash": flow.metadata.hash,
            "d": flow.metadata.d,
            "n": flow.metadata.n,
            "theta_min": np.asarray(flow.metadata.theta_min).tolist(),
            "theta_max": np.asarray(flow.metadata.theta_max).tolist(),
        },
        "train_loss": [float(v) for v in flow.train_loss],
        "valid_loss": [float(v) for v in flow.valid_loss],
        "has_opt_state": opt_state is not None,
    }
    with open(os.path.join(directory, "flow.json"), "w") as f:
        json.dump(meta, f, indent=1)
    if opt_state is not None:
        np.savez(os.path.join(directory, "opt_state.npz"),
                 **_leaves_to_npz(opt_state))


def save_ensemble(directory: str, ens, *, erase: bool = False) -> None:
    """Persist an :class:`~densityflows_tpu.ensemble.EnsembleFlow`.

    The stacked member parameters (leading K axis on every leaf) are
    saved through the same element spec/arrays format — the spec simply
    records the K-leading shapes."""
    _prepare_dir(directory, erase)
    proto = jax.tree_util.tree_map(lambda l: l[0], ens.model)
    with open(os.path.join(directory, "ensemble.json"), "w") as f:
        json.dump(
            {
                "format_version": _FORMAT_VERSION,
                "n_members": ens.n_members,
                "member_spec": element_spec(proto),
                "base": element_spec(ens.base),
                "metadata": {
                    "hash": ens.metadata.hash,
                    "d": ens.metadata.d,
                    "n": ens.metadata.n,
                    "theta_min": np.asarray(ens.metadata.theta_min).tolist(),
                    "theta_max": np.asarray(ens.metadata.theta_max).tolist(),
                },
                "train_loss": [list(map(float, row)) for row in ens.train_loss],
                "valid_loss": [list(map(float, row)) for row in ens.valid_loss],
            },
            f, indent=1,
        )
    np.savez(os.path.join(directory, "stacked.npz"), **_leaves_to_npz(ens.model))
    np.savez(os.path.join(directory, "base.npz"), **_leaves_to_npz(ens.base))


def load_ensemble(directory: str):
    """Load an ensemble saved by :func:`save_ensemble`."""
    from ..ensemble import EnsembleFlow

    with open(os.path.join(directory, "ensemble.json")) as f:
        meta = json.load(f)
    k = meta["n_members"]
    proto = element_from_spec(meta["member_spec"])
    skeleton = jax.tree_util.tree_map(
        lambda l: jnp.zeros((k,) + l.shape, l.dtype), proto
    )
    stacked = _npz_into_tree(skeleton, np.load(os.path.join(directory, "stacked.npz")))
    base = _npz_into_tree(
        element_from_spec(meta["base"]), np.load(os.path.join(directory, "base.npz"))
    )
    md = meta["metadata"]
    metadata = MetaData(
        md["hash"], md["d"], md["n"],
        np.asarray(md["theta_min"], np.float32),
        np.asarray(md["theta_max"], np.float32),
    )
    return EnsembleFlow(
        stacked, metadata, base, k,
        train_loss=meta["train_loss"], valid_loss=meta["valid_loss"],
    )


def load_flow(directory: str, optimizer=None):
    """Load a flow saved by :func:`save_flow` (reference ``load_flow``,
    Loading.jl:348-377).

    If ``optimizer`` (the optax transform used before) is given and the
    checkpoint holds optimizer state, returns ``(flow, opt_state)``;
    otherwise returns just the flow.
    """
    with open(os.path.join(directory, "flow.json")) as f:
        meta = json.load(f)
    model = load_element(os.path.join(directory, "model"))
    base = load_element(os.path.join(directory, "base"))
    md = meta["metadata"]
    metadata = MetaData(
        md["hash"], md["d"], md["n"],
        np.asarray(md["theta_min"], np.float32),
        np.asarray(md["theta_max"], np.float32),
    )
    flow = Flow(model, metadata, base, meta["train_loss"], meta["valid_loss"])
    if optimizer is not None and meta.get("has_opt_state"):
        skeleton = optimizer.init(model)
        npz = np.load(os.path.join(directory, "opt_state.npz"))
        return flow, _npz_into_tree(skeleton, npz)
    return flow
