"""Orbax-backed sharded checkpoints (production multi-host path).

The default npz checkpoints (``utils.checkpoint``) gather arrays to the
host — fine single-host, wrong at scale. This backend stores the SAME
declarative spec JSON next to an Orbax/tensorstore array tree, so:

- sharded arrays save/restore without ever materializing on one host
  (each host writes its shards; restore honors a target sharding),
- the two formats stay interchangeable at the API level
  (``save_flow_orbax``/``load_flow_orbax`` mirror
  ``save_flow``/``load_flow``).

SURVEY.md §5: "TPU build must checkpoint optimizer state too (sharded,
orbax-style)" — this is that subsystem.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from ..models.flow import Flow
from ..data import MetaData
from .checkpoint import element_spec, element_from_spec

__all__ = ["save_flow_orbax", "load_flow_orbax"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_flow_orbax(directory: str, flow: Flow, opt_state=None) -> None:
    """Persist flow (+ optional optimizer state) with Orbax array storage.

    Layout: ``flow.json`` (spec + metadata + histories) beside Orbax
    directories ``model/``, ``base/`` and optionally ``opt_state/``.
    """
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    ckptr = _checkpointer()
    meta = {
        "format": "orbax",
        "model_spec": element_spec(flow.model),
        "base_spec": element_spec(flow.base),
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
    ckptr.save(os.path.join(directory, "model"), flow.model, force=True)
    ckptr.save(os.path.join(directory, "base"), flow.base, force=True)
    if opt_state is not None:
        ckptr.save(os.path.join(directory, "opt_state"), opt_state, force=True)
    ckptr.wait_until_finished()


def load_flow_orbax(directory: str, optimizer=None, *, sharding_fn=None):
    """Load a flow saved by :func:`save_flow_orbax`.

    ``sharding_fn(leaf_skeleton) -> Sharding`` (optional) places each
    restored array (e.g. TP-sharded conditioner weights); default is the
    checkpoint's stored layout on the current devices.

    Returns ``flow`` or ``(flow, opt_state)`` when ``optimizer`` is given
    and state was saved.
    """
    directory = os.path.abspath(directory)
    with open(os.path.join(directory, "flow.json")) as f:
        meta = json.load(f)
    ckptr = _checkpointer()

    def restore(subdir, skeleton):
        target = jax.tree_util.tree_map(
            lambda leaf: jax.ShapeDtypeStruct(
                leaf.shape, leaf.dtype,
                sharding=sharding_fn(leaf) if sharding_fn else None,
            ),
            skeleton,
        )
        return ckptr.restore(os.path.join(directory, subdir), target)

    model = restore("model", element_from_spec(meta["model_spec"]))
    base = restore("base", element_from_spec(meta["base_spec"]))
    md = meta["metadata"]
    metadata = MetaData(
        md["hash"], md["d"], md["n"],
        np.asarray(md["theta_min"], np.float32),
        np.asarray(md["theta_max"], np.float32),
    )
    flow = Flow(model, metadata, base, meta["train_loss"], meta["valid_loss"])
    if optimizer is not None and meta.get("has_opt_state"):
        opt_state = restore("opt_state", optimizer.init(model))
        return flow, opt_state
    return flow
