"""Whole-run fused training: fold a FlowChain for ops/pallas_train.py.

Small flows train launch-bound, not compute-bound: the reference README
config (5-D, hidden-16, batch 64 — /root/reference/src/Flows.jl:380-445,
README.md:54-79) spends >99% of its fused-XLA step time on the kernel
*sequence*, not FLOPs. This module compiles the ENTIRE multi-epoch
training loop (shuffled batches, inverse fold, hand-derived backward,
Adam, per-epoch full-split evals) into one Pallas kernel with parameters
and Adam moments resident in VMEM — see ops/pallas_train.py for the
kernel and the equivalence argument (folded zero-padding embedding +
gradient masks ⇒ Adam-on-folded ≡ Adam-on-original).

Entry points:

- :func:`chain_train_fold` — fold a chain into (plan, trainable params,
  gradient masks, constants, unfold) or raise :class:`UnsupportedFusedTrain`.
- :func:`train_fused` — drop-in for ``train()`` on the supported surface
  (called via ``train(..., fused_kernel=True)``): same shuffle semantics,
  same histories, returns an ``optax.adam``-compatible opt_state so a
  fused run can be continued by the jnp program and vice versa.

Supported: FlowChain of RNVP / joint-RNVP / NICE couplings
(activations relu/tanh/sigmoid/identity; ``max_log_scale`` tanh clamps
included since r4 — the clamp derivative is value-based) +
non-trainable NormalizationLayers + PermutationLayers (folded away into
the downstream couplings' index maps — the kernel never permutes), a
StandardNormal base, the Adam update (default or ``df.adam``
hyperparameters). Anything else raises — callers fall back to
``train()``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas_train import run_fused_train, train_vmem_bytes
from .blocks import CouplingBlock
from .chains import FlowChain
from .distributions import StandardNormal
from .layers import (
    JointRNVPCouplingLayer,
    NICECouplingLayer,
    RNVPCouplingLayer,
)
from .glow import ActNormLayer
from .normalization import NormalizationLayer, PermutationLayer

__all__ = ["UnsupportedFusedTrain", "chain_train_fold", "train_fused"]

_ACTS = ("relu", "tanh", "sigmoid", "identity")

# VMEM feasibility ceiling (bytes) — mirrors ops/pallas_train._VMEM_BUDGET
# (12 MB: see the rationale there — the 4010-epoch crossover run is
# hardware-proven at an estimated 10.2 MB)
_BUDGET = 12 * 1024 * 1024

# HBM ceiling for the pre-gathered batch slab (ops/pallas_train.py
# materializes (epochs, n_batches, batch, d[+n]) in HBM before the kernel
# — O(epochs × rows) memory the VMEM estimate does not see). 2 GB leaves
# the v5e's 16 GB HBM plenty of headroom; the envelope this kernel wins
# in (launch-bound tiny configs) is far below it anyway.
_HBM_SLAB_BUDGET = 2 * 1024**3


class UnsupportedFusedTrain(ValueError):
    """The chain / config is outside the fused-train kernel's envelope."""


def _iter_paths(chain):
    """(path, layer) in INVERSE execution order (the training direction,
    reference src/Chains.jl:149-165): chain reversed, block members
    (layer_2, layer_1)."""
    if not isinstance(chain, FlowChain):
        raise UnsupportedFusedTrain("fused train needs a FlowChain")
    out = []
    for i in range(len(chain.layers) - 1, -1, -1):
        layer = chain.layers[i]
        if isinstance(layer, CouplingBlock):
            out.append(((i, "layer_2"), layer.layer_2))
            out.append(((i, "layer_1"), layer.layer_1))
        else:
            out.append(((i,), layer))
    return out


def _check_net(net):
    if net.activation not in _ACTS:
        raise UnsupportedFusedTrain(
            f"activation {net.activation!r} has no value-based derivative "
            f"in the kernel (supported: {_ACTS})")
    if len(net.weights) < 2:
        raise UnsupportedFusedTrain("single-dense conditioners unsupported")


def _fold_net(net, d, n, id_idx, af_idx):
    """Fold one conditioner MLP exactly like fused_chain._coupling_entry
    (zero-padded x block, af-scattered final layer) and build the 0/1
    gradient masks for the scattered arrays."""
    _check_net(net)
    has_bias = bool(net.biases[0].shape[0]) if net.biases else False
    ws = [jnp.asarray(w, jnp.float32) for w in net.weights]
    L = len(ws)
    params, masks = [], []
    w0 = ws[0]
    if n > 0:
        params.append(w0[:n])
        masks.append(None)
    if len(id_idx) > 0:
        w1x = jnp.zeros((d, w0.shape[1]), jnp.float32)
        params.append(w1x.at[id_idx].set(w0[n:]))
        m = jnp.zeros((d, w0.shape[1]), jnp.float32)
        masks.append(m.at[id_idx].set(1.0))
    params.extend(ws[1:-1])
    masks.extend([None] * (L - 2))
    wf = jnp.zeros((ws[-1].shape[0], d), jnp.float32)
    params.append(wf.at[:, af_idx].set(ws[-1]))
    mf = jnp.zeros((ws[-1].shape[0], d), jnp.float32)
    masks.append(mf.at[:, af_idx].set(1.0))
    if has_bias:
        for b in net.biases[:-1]:
            params.append(jnp.asarray(b, jnp.float32).reshape(1, -1))
            masks.append(None)
        bf = jnp.zeros((1, d), jnp.float32)
        params.append(bf.at[0, af_idx].set(
            jnp.asarray(net.biases[-1], jnp.float32)))
        mb = jnp.zeros((1, d), jnp.float32)
        masks.append(mb.at[0, af_idx].set(1.0))
    return params, masks, L, has_bias


def _unfold_net(net, folded, n, id_idx, af_idx):
    """Inverse of `_fold_net`: slice the on-support entries back into the
    original MLP layout (the embedding is the identity there)."""
    has_bias = bool(net.biases[0].shape[0]) if net.biases else False
    L = len(net.weights)
    i = 0
    parts = []
    if n > 0:
        parts.append(folded[i])
        i += 1
    if len(id_idx) > 0:
        parts.append(folded[i][id_idx])
        i += 1
    ws = [jnp.concatenate(parts, 0) if len(parts) > 1 else parts[0]]
    ws.extend(folded[i:i + L - 2])
    i += L - 2
    ws.append(folded[i][:, af_idx])
    i += 1
    if has_bias:
        bs = [folded[i + k].reshape(-1) for k in range(L - 1)]
        bs.append(folded[i + L - 1][0, af_idx])
        i += L
    else:
        bs = list(net.biases)
    return type(net)(tuple(ws), tuple(bs), net.activation), i


def _joint_fold(layer, d, n, id_idx, af_idx):
    net = layer.st_net
    _check_net(net)
    has_bias = bool(net.biases[0].shape[0]) if net.biases else False
    ws = [jnp.asarray(w, jnp.float32) for w in net.weights]
    L = len(ws)
    a = layer.axes.transform_dim
    params, masks = [], []
    w0 = ws[0]
    if n > 0:
        params.append(w0[:n])
        masks.append(None)
    if len(id_idx) > 0:
        w1x = jnp.zeros((d, w0.shape[1]), jnp.float32)
        params.append(w1x.at[id_idx].set(w0[n:]))
        m = jnp.zeros((d, w0.shape[1]), jnp.float32)
        masks.append(m.at[id_idx].set(1.0))
    params.extend(ws[1:-1])
    masks.extend([None] * (L - 2))
    wf = ws[-1]  # (H, 2a): s head then t head
    col_mask = jnp.zeros((wf.shape[0], d), jnp.float32).at[:, af_idx].set(1.0)
    for head in (wf[:, :a], wf[:, a:]):
        scat = jnp.zeros((wf.shape[0], d), jnp.float32)
        params.append(scat.at[:, af_idx].set(head))
        masks.append(col_mask)
    if has_bias:
        for b in net.biases[:-1]:
            params.append(jnp.asarray(b, jnp.float32).reshape(1, -1))
            masks.append(None)
        bf = jnp.asarray(net.biases[-1], jnp.float32)
        bm = jnp.zeros((1, d), jnp.float32).at[0, af_idx].set(1.0)
        for head in (bf[:a], bf[a:]):
            scat = jnp.zeros((1, d), jnp.float32)
            params.append(scat.at[0, af_idx].set(head))
            masks.append(bm)
    return params, masks, L, has_bias


def _joint_unfold(layer, folded, n, id_idx, af_idx):
    net = layer.st_net
    has_bias = bool(net.biases[0].shape[0]) if net.biases else False
    L = len(net.weights)
    i = 0
    parts = []
    if n > 0:
        parts.append(folded[i])
        i += 1
    if len(id_idx) > 0:
        parts.append(folded[i][id_idx])
        i += 1
    ws = [jnp.concatenate(parts, 0) if len(parts) > 1 else parts[0]]
    ws.extend(folded[i:i + L - 2])
    i += L - 2
    head_s = folded[i][:, af_idx]
    head_t = folded[i + 1][:, af_idx]
    i += 2
    ws.append(jnp.concatenate([head_s, head_t], 1))
    if has_bias:
        bs = [folded[i + k].reshape(-1) for k in range(L - 1)]
        bs.append(jnp.concatenate(
            [folded[i + L - 1][0, af_idx], folded[i + L][0, af_idx]]))
        i += L + 1
    else:
        bs = list(net.biases)
    return type(net)(tuple(ws), tuple(bs), net.activation), i


def _packable(s_net, t_net) -> bool:
    """s/t pairs with identical architecture pack into ONE MLP: concat
    first layer, block-diagonal hiddens, (2H, 2d) final — under the
    kernel's 128-lane tile padding every packed matmul costs the same as
    ONE of the two it replaces, halving the per-batch op count (the
    measured bottleneck; the zero off-diagonal blocks are kept zero by
    the gradient masks, so the math stays the exact split
    parameterization of the reference, RNVP.jl:41-48)."""
    if s_net.activation != t_net.activation:
        return False
    if len(s_net.weights) != len(t_net.weights):
        return False
    for a, b in zip(s_net.weights, t_net.weights):
        if a.shape != b.shape:
            return False
    bias_s = bool(s_net.biases[0].shape[0]) if s_net.biases else False
    bias_t = bool(t_net.biases[0].shape[0]) if t_net.biases else False
    return bias_s == bias_t


def _packed_fold(layer, d, n, id_idx, af_idx):
    s_net, t_net = layer.s_net, layer.t_net
    _check_net(s_net)
    has_bias = bool(s_net.biases[0].shape[0]) if s_net.biases else False
    ws = [jnp.asarray(w, jnp.float32) for w in s_net.weights]
    wt = [jnp.asarray(w, jnp.float32) for w in t_net.weights]
    L = len(ws)
    params, masks = [], []
    # first layer: rows = [θ | full-d zero-padded x], cols = [s-half | t-half]
    k_in = n + d
    H = ws[0].shape[1]
    w1 = jnp.zeros((k_in, 2 * H), jnp.float32)
    m1 = jnp.zeros((k_in, 2 * H), jnp.float32)
    if n > 0:
        w1 = w1.at[:n, :H].set(ws[0][:n]).at[:n, H:].set(wt[0][:n])
        m1 = m1.at[:n].set(1.0)
    if len(id_idx) > 0:
        rows = n + id_idx
        w1 = w1.at[rows, :H].set(ws[0][n:]).at[rows, H:].set(wt[0][n:])
        m1 = m1.at[rows].set(1.0)
    params.append(w1)
    masks.append(m1)
    # hidden layers: block-diag [Ws 0; 0 Wt] with block-diag masks
    for l in range(1, L - 1):
        hi, ho = ws[l].shape
        wl = jnp.zeros((2 * hi, 2 * ho), jnp.float32)
        wl = wl.at[:hi, :ho].set(ws[l]).at[hi:, ho:].set(wt[l])
        ml = jnp.zeros((2 * hi, 2 * ho), jnp.float32)
        ml = ml.at[:hi, :ho].set(1.0).at[hi:, ho:].set(1.0)
        params.append(wl)
        masks.append(ml)
    # final: (2H, 2d) = [[Wfs→af 0]; [0 Wft→af]]
    hf = ws[-1].shape[0]
    wf = jnp.zeros((2 * hf, 2 * d), jnp.float32)
    wf = wf.at[:hf, af_idx].set(ws[-1]).at[hf:, d + af_idx].set(wt[-1])
    mf = jnp.zeros((2 * hf, 2 * d), jnp.float32)
    mf = mf.at[:hf, af_idx].set(1.0).at[hf:, d + af_idx].set(1.0)
    params.append(wf)
    masks.append(mf)
    if has_bias:
        for l in range(L - 1):
            bl = jnp.concatenate([
                jnp.asarray(s_net.biases[l], jnp.float32),
                jnp.asarray(t_net.biases[l], jnp.float32)]).reshape(1, -1)
            params.append(bl)
            masks.append(None)
        bf = jnp.zeros((1, 2 * d), jnp.float32)
        bf = bf.at[0, af_idx].set(
            jnp.asarray(s_net.biases[-1], jnp.float32))
        bf = bf.at[0, d + af_idx].set(
            jnp.asarray(t_net.biases[-1], jnp.float32))
        mb = jnp.zeros((1, 2 * d), jnp.float32)
        mb = mb.at[0, af_idx].set(1.0).at[0, d + af_idx].set(1.0)
        params.append(bf)
        masks.append(mb)
    return params, masks, L, has_bias


def _packed_unfold(layer, folded, n, id_idx, af_idx):
    s_net, t_net = layer.s_net, layer.t_net
    has_bias = bool(s_net.biases[0].shape[0]) if s_net.biases else False
    L = len(s_net.weights)
    d = layer.axes.d
    H = s_net.weights[0].shape[1]
    i = 0
    ws_s, ws_t = [], []
    w1 = folded[i]; i += 1
    rows = (list(range(n)) + [n + int(r) for r in id_idx])
    ws_s.append(w1[np.asarray(rows), :H])
    ws_t.append(w1[np.asarray(rows), H:])
    for l in range(1, L - 1):
        hi, ho = s_net.weights[l].shape
        wl = folded[i]; i += 1
        ws_s.append(wl[:hi, :ho])
        ws_t.append(wl[hi:, ho:])
    hf = s_net.weights[-1].shape[0]
    wf = folded[i]; i += 1
    ws_s.append(wf[:hf, af_idx])
    ws_t.append(wf[hf:, d + af_idx])
    if has_bias:
        bs_s, bs_t = [], []
        for l in range(L - 1):
            bl = folded[i]; i += 1
            w = s_net.biases[l].shape[0]
            bs_s.append(bl[0, :w])
            bs_t.append(bl[0, w:])
        bf = folded[i]; i += 1
        bs_s.append(bf[0, af_idx])
        bs_t.append(bf[0, d + af_idx])
    else:
        bs_s, bs_t = list(s_net.biases), list(t_net.biases)
    new_s = type(s_net)(tuple(ws_s), tuple(bs_s), s_net.activation)
    new_t = type(t_net)(tuple(ws_t), tuple(bs_t), t_net.activation)
    return dataclasses.replace(layer, s_net=new_s, t_net=new_t), i


def _coupling_fold(layer, coord_map=None):
    """``coord_map`` (an int array, kernel-frame dim per layer-frame dim)
    relabels the layer's axes into the kernel's coordinate frame — how
    PermutationLayers fold away entirely: the kernel never permutes, the
    downstream couplings just read/write the permuted dims (design.md
    §12e). ``None`` is the identity."""
    ax = layer.axes
    if ax.transform_dim == 0 or ax.nn_input_dim == 0:
        raise UnsupportedFusedTrain("degenerate coupling axes")
    # Glow-style tanh clamp (layers.py max_log_scale): supported in the
    # kernel since r4 — the clamp derivative 1 − (s_c/M)² is a function
    # of the clamped VALUE, so it fits the value-based backward
    clamp = float(getattr(layer, "max_log_scale", 0.0))
    d, n = ax.d, ax.n
    id_idx = np.asarray(ax.axis_id, np.int32)
    af_idx = np.asarray(ax.axis_af, np.int32)
    if coord_map is not None:
        id_idx = coord_map[id_idx].astype(np.int32)
        af_idx = coord_map[af_idx].astype(np.int32)
    has_th, has_id = n > 0, len(id_idx) > 0

    if isinstance(layer, RNVPCouplingLayer) and _packable(layer.s_net,
                                                          layer.t_net):
        _check_net(layer.s_net)
        params, masks, L, has_bias = _packed_fold(layer, d, n, id_idx,
                                                  af_idx)
        op = ("coupling", "packed", "inv", L, 0,
              layer.s_net.activation, layer.s_net.activation,
              has_bias, False, has_th, has_id, clamp)
        return op, params, masks
    if isinstance(layer, JointRNVPCouplingLayer):
        params, masks, L, has_bias = _joint_fold(layer, d, n, id_idx, af_idx)
        op = ("coupling", "joint", "inv", L, 0,
              layer.st_net.activation, layer.st_net.activation,
              has_bias, False, has_th, has_id, clamp)
        return op, params, masks
    if isinstance(layer, RNVPCouplingLayer):
        ps, ms, n_s, bias_s = _fold_net(layer.s_net, d, n, id_idx, af_idx)
        pt, mt, n_t, bias_t = _fold_net(layer.t_net, d, n, id_idx, af_idx)
        op = ("coupling", "nvp", "inv", n_s, n_t,
              layer.s_net.activation, layer.t_net.activation,
              bias_s, bias_t, has_th, has_id, clamp)
        return op, ps + pt, ms + mt
    # NICE
    pt, mt, n_t, bias_t = _fold_net(layer.t_net, d, n, id_idx, af_idx)
    op = ("coupling", "nice", "inv", 0, n_t,
          "identity", layer.t_net.activation, False, bias_t,
          has_th, has_id, 0.0)
    return op, pt, mt


def _coupling_unfold(layer, folded, coord_map=None):
    ax = layer.axes
    n = ax.n
    id_idx = np.asarray(ax.axis_id, np.int32)
    af_idx = np.asarray(ax.axis_af, np.int32)
    if coord_map is not None:
        # slice at the SAME kernel-frame positions the fold scattered to
        id_idx = coord_map[id_idx].astype(np.int32)
        af_idx = coord_map[af_idx].astype(np.int32)
    if isinstance(layer, RNVPCouplingLayer) and _packable(layer.s_net,
                                                          layer.t_net):
        return _packed_unfold(layer, folded, n, id_idx, af_idx)
    if isinstance(layer, JointRNVPCouplingLayer):
        net, used = _joint_unfold(layer, folded, n, id_idx, af_idx)
        return dataclasses.replace(layer, st_net=net), used
    if isinstance(layer, RNVPCouplingLayer):
        s_net, used_s = _unfold_net(layer.s_net, folded, n, id_idx, af_idx)
        t_net, used_t = _unfold_net(layer.t_net, folded[used_s:], n,
                                    id_idx, af_idx)
        return dataclasses.replace(layer, s_net=s_net, t_net=t_net), \
            used_s + used_t
    t_net, used = _unfold_net(layer.t_net, folded, n, id_idx, af_idx)
    return dataclasses.replace(layer, t_net=t_net), used


def _anorm_fold(layer, cmap=None):
    """ActNorm → [log_scale (1, d), bias (1, d)] in the kernel frame
    (relabeled through the accumulated coordinate map like the
    Normalization constants)."""
    s = jnp.asarray(layer.log_scale, jnp.float32).reshape(1, -1)
    b = jnp.asarray(layer.bias, jnp.float32).reshape(1, -1)
    if cmap is not None:
        inv_m = np.argsort(cmap)
        s, b = s[:, inv_m], b[:, inv_m]
    return [s, b]


def _anorm_unfold(layer, folded, cmap=None):
    s, b = folded[0], folded[1]
    if cmap is not None:
        s, b = s[:, cmap], b[:, cmap]
    return dataclasses.replace(layer, log_scale=s.reshape(-1),
                               bias=b.reshape(-1)), 2


def _affine_const(layer):
    """NormalizationLayer → inverse-direction (a, b, signed-ldj) constants
    (non-trainable by design — stop-gradient data range,
    models/normalization.py; reference Normalization.jl:64-77)."""
    lo = jax.lax.stop_gradient(layer.x_min).astype(jnp.float32)
    hi = jax.lax.stop_gradient(layer.x_max).astype(jnp.float32)
    diff = hi - lo
    delta = layer.beta - layer.alpha
    c = jnp.sum(jnp.log(diff / delta)).reshape(1, 1)
    a = delta / diff
    b = (layer.alpha * hi - layer.beta * lo) / diff
    return [a.reshape(1, -1), b.reshape(1, -1), -c]


def chain_train_fold(chain):
    """Fold a chain for the whole-run train kernel.

    Returns ``(plan, tcounts, tparams, masks, mask_slots, cparams,
    fold_state, unfold)`` where ``unfold(folded_list) -> FlowChain``
    rebuilds the chain with updated weights, and
    ``fold_state(value_chain) -> folded_list`` folds a chain-shaped value
    tree (used to fold/unfold Adam moments with the SAME embedding).
    Raises :class:`UnsupportedFusedTrain` outside the envelope.
    """
    entries = _iter_paths(chain)
    plan, tcounts = [], []
    tparams, masks_dense, cparams = [], [], []
    spec = []  # (path, layer, trainable param count, coord_map) per op
    # PermutationLayers fold away: the kernel keeps its working vector in
    # the ORIGINAL x frame and every downstream layer's dims are relabeled
    # through the accumulated coordinate map instead (a permutation is a
    # pure frame change with ldj = 0; a leftover trailing map is free too
    # because the StandardNormal base is permutation-symmetric — Σz² and
    # the ldj are unchanged, so loss/grads/trajectory match the jnp
    # program exactly). design.md §12e.
    cmap = None  # layer-frame dim k lives at kernel dim cmap[k]
    for path, layer in entries:
        if isinstance(layer, PermutationLayer):
            inv = np.asarray(layer._inv(), np.int64)
            cmap = inv if cmap is None else cmap[inv]
            continue
        if isinstance(layer, (RNVPCouplingLayer, JointRNVPCouplingLayer,
                              NICECouplingLayer)):
            op, ps, ms = _coupling_fold(layer, cmap)
            plan.append(op)
            tcounts.append(len(ps))
            tparams.extend(ps)
            masks_dense.extend(ms)
            spec.append((path, layer, len(ps), cmap))
        elif isinstance(layer, ActNormLayer):
            # TRAINABLE per-dim affine (Glow §3.1): two (1, d) params in
            # the kernel's "anorm" op, no gradient masks (every entry is
            # a real parameter)
            plan.append(("anorm",))
            tcounts.append(2)
            tparams.extend(_anorm_fold(layer, cmap))
            masks_dense.extend([None, None])
            spec.append((path, layer, 2, cmap))
        elif isinstance(layer, NormalizationLayer):
            plan.append(("affine",))
            tcounts.append(0)
            consts = _affine_const(layer)
            if cmap is not None:
                inv_m = np.argsort(cmap)
                consts = [consts[0][:, inv_m], consts[1][:, inv_m],
                          consts[2]]
            cparams.extend(consts)
            spec.append((path, layer, 0, cmap))
        else:
            raise UnsupportedFusedTrain(
                f"{type(layer).__name__} is outside the fused-train "
                "envelope (RNVP/joint/NICE couplings + ActNorm/"
                "Normalization/Permutation only)")
    if not any(c for c in tcounts):
        raise UnsupportedFusedTrain("no trainable layers")

    # sparse mask slots: only scattered params carry masks
    mask_slots, masks = [], []
    for m in masks_dense:
        if m is None:
            mask_slots.append(None)
        else:
            mask_slots.append(len(masks))
            masks.append(m)

    def unfold(folded, template=None):
        # ``template`` supplies the non-trainable leaves (default: the
        # original chain). Adam-moment trees pass a zeros_like template
        # so non-trainable leaves (Normalization constants) stay 0, as
        # optax keeps them.
        layers = list((template or chain).layers)
        i = 0
        for path, layer, cnt, cm in spec:
            if cnt == 0:
                continue
            if isinstance(layer, ActNormLayer):
                new_layer, used = _anorm_unfold(layer, folded[i:i + cnt],
                                                cm)
            else:
                new_layer, used = _coupling_unfold(layer,
                                                   folded[i:i + cnt], cm)
            assert used == cnt, (used, cnt)
            i += cnt
            if len(path) == 1:
                layers[path[0]] = new_layer
            else:
                blk = layers[path[0]]
                blk = dataclasses.replace(blk, **{path[1]: new_layer})
                layers[path[0]] = blk
        return FlowChain(tuple(layers))

    def fold_state(value_chain):
        out = []
        for path, _layer, cnt, cm in spec:
            if cnt == 0:
                continue
            node = value_chain.layers[path[0]]
            if len(path) == 2:
                node = getattr(node, path[1])
            if isinstance(node, ActNormLayer):
                ps = _anorm_fold(node, cm)
            else:
                _op, ps, _ms = _coupling_fold(node, cm)
            assert len(ps) == cnt
            out.extend(ps)
        return out

    return (tuple(plan), tuple(tcounts), tparams, masks, tuple(mask_slots),
            cparams, fold_state, unfold)


def _check_budget(plan, tparams, cparams, n, nv, d, n_cond, batchsize,
                  epochs, weighted=False, track_best=False, guarded=False):
    n_batches = -(-n // batchsize)
    # the slab check first: at huge epoch counts BOTH budgets trip, and
    # "run fewer epochs per call" is the actionable message there
    slab = epochs * n_batches * batchsize * (d + n_cond) * 4
    if slab > _HBM_SLAB_BUDGET:
        raise UnsupportedFusedTrain(
            f"pre-gathered batch slab ~{slab / 1e9:.1f} GB (epochs × rows "
            f"× features) exceeds the HBM budget "
            f"({_HBM_SLAB_BUDGET / 1e9:.0f} GB) — run fewer epochs per "
            "call or use train() (its scan re-gathers per epoch)")
    need = train_vmem_bytes(plan, tparams, cparams, n_batches, batchsize,
                            d, n_cond, n, nv, weighted=weighted,
                            epochs=epochs, track_best=track_best,
                            guarded=guarded)
    if need > _BUDGET:
        raise UnsupportedFusedTrain(
            f"working set ~{need / 1e6:.1f} MB exceeds the VMEM budget "
            f"({_BUDGET / 1e6:.0f} MB) — dataset/model too large for the "
            "whole-run kernel; use train() (its scan streams from HBM)")


def train_fused(
    flow,
    data,
    *,
    epochs: int = 100,
    batchsize: int = 64,
    shuffle: bool = True,
    verbose: bool = True,
    key=None,
    opt_state=None,
    lr: float = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    track_best: bool = False,
    weights=None,
    skip_nonfinite: bool = False,
):
    """``train()`` on the whole-run kernel (``train(fused_kernel=True)``).

    Same contract on the supported surface: reference-default Adam(1e-3)
    (test/runtests.jl:114), fresh shuffle per epoch, per-epoch full-split
    NLL histories appended to the flow, returns an ``optax.adam``-shaped
    ``opt_state`` (count + moments) so the run can be continued by either
    path. Batch composition matches ``train()`` exactly (same permutation
    keys); parameter trajectories agree to float accumulation order.
    ``track_best=True`` returns ``(opt_state, best_model)`` — the exact
    parameter pytree at the lowest-valid-NLL epoch, selected in-kernel
    (the early-stopping restore path). ``weights`` takes per-RAW-row
    importance weights (the SNPE-B correction, ``train(weights=…)``
    semantics): batch losses and both full-split epoch evals become the
    weighted NLL −Σw·lp/Σw. ``skip_nonfinite=True`` applies each batch
    update only when the loss and all (masked) gradients are finite —
    skipped steps leave params/Adam state untouched, do not advance the
    Adam step count, and are counted per epoch into
    ``flow.skipped_updates`` (``train(skip_nonfinite=…)`` semantics).
    """
    import optax

    if not isinstance(flow.base, StandardNormal):
        raise UnsupportedFusedTrain("fused train supports the "
                                    "StandardNormal base only")
    (plan, tcounts, tparams, masks, mask_slots, cparams, fold_state,
     unfold) = chain_train_fold(flow.model)

    x_train, th_train = data.normalized_training_data(flow.metadata)
    x_valid, th_valid = data.normalized_validation_data(flow.metadata)
    n, nv = x_train.shape[0], x_valid.shape[0]
    if n == 0 or nv == 0:
        raise UnsupportedFusedTrain("empty training/validation split")
    d = x_train.shape[-1]
    n_cond = th_train.shape[-1]

    w_train = w_valid = None
    if weights is not None:
        wf = np.asarray(weights, np.float32).reshape(-1)
        if wf.shape[0] != data.x.shape[0]:
            raise ValueError(
                f"weights must have one entry per data row "
                f"({data.x.shape[0]}), got {wf.shape[0]}")
        w_train = wf[np.asarray(data.partition.training)]
        w_valid = wf[np.asarray(data.partition.validation)]

    # epoch-chunking (r5): the slab/VMEM budgets are (near-)linear in
    # the epoch count, so a run too long for one kernel call is split
    # into balanced epoch chunks that each fit — folded params/moments
    # carry between chunks on device, shuffle keys are ONE
    # split(key, epochs) sliced across chunks, and the Adam count
    # continues — so the chunked trajectory equals the single-call one
    # exactly. Only a config whose SINGLE-epoch working set exceeds the
    # budgets (dataset/model too large for VMEM-resident evals/params)
    # stays unsupported.
    def _fits(e):
        try:
            _check_budget(plan, tparams, cparams, n, nv, d, n_cond,
                          batchsize, e, weighted=weights is not None,
                          track_best=track_best, guarded=skip_nonfinite)
            return True
        except UnsupportedFusedTrain:
            return False

    stream = False
    if _fits(epochs):
        chunk = epochs
    elif _fits(1):
        lo_e, hi_e = 1, epochs
        while lo_e < hi_e:  # largest epoch count that fits
            mid = (lo_e + hi_e + 1) // 2
            if _fits(mid):
                lo_e = mid
            else:
                hi_e = mid - 1
        n_chunks = -(-epochs // lo_e)
        chunk = -(-epochs // n_chunks)  # balanced; ceil(E/ceil(E/m)) <= m
    else:
        # a single epoch is out of the RESIDENT envelope (dataset rows
        # too large for VMEM-resident slab/evals) → the STREAMING kernel
        # (per-batch HBM blocks, O(1)-in-rows VMEM); raises
        # UnsupportedFusedTrain itself if the model is out of ITS
        # envelope
        stream = True
        chunk = 0

    if key is None:
        key = jax.random.key(np.random.randint(0, 2**31 - 1))

    count0 = 0
    if opt_state is not None:
        adam = opt_state[0]
        if not hasattr(adam, "mu") or not hasattr(adam, "nu"):
            raise UnsupportedFusedTrain(
                "opt_state is not an Adam state (need .mu/.nu moments)")
        count0 = int(adam.count)
        mu = fold_state(adam.mu)
        nu = fold_state(adam.nu)
    else:
        mu = [jnp.zeros_like(p) for p in tparams]
        nu = [jnp.zeros_like(p) for p in tparams]

    import time as _time

    t0 = _time.perf_counter()
    theta = jnp.asarray(th_train) if n_cond else None
    theta_v = jnp.asarray(th_valid) if n_cond else None
    x_dev, xv_dev = jnp.asarray(x_train), jnp.asarray(x_valid)
    n_batches = -(-n // batchsize)
    flow.fused_kernel_mode = ("stream" if stream else
                              "resident" if chunk == epochs else
                              "resident-chunked")
    if stream:
        from ..ops.pallas_train_stream import (
            eval_snapshots,
            run_fused_train_stream,
            stream_vmem_bytes,
        )

        weighted = weights is not None
        # HBM chunking: per-epoch gathered slab + per-epoch snapshots
        slab_pe = (n_batches * batchsize
                   * (d + n_cond + (1 if weighted else 0)) * 4)
        snap_pe = sum(int(np.prod(p.shape)) for p in tparams) * 4
        e_max = max(1, int(_HBM_SLAB_BUDGET // (slab_pe + snap_pe)))
        n_chunks = -(-epochs // e_max)
        chunk = -(-epochs // n_chunks)
        need = stream_vmem_bytes(plan, tparams, cparams, batchsize, d,
                                 n_cond, weighted=weighted, epochs=chunk,
                                 guarded=skip_nonfinite)
        if need > _BUDGET:
            raise UnsupportedFusedTrain(
                f"streaming working set ~{need / 1e6:.1f} MB exceeds "
                f"the VMEM budget ({_BUDGET / 1e6:.0f} MB) — model too "
                "large for the streaming kernel; use train()")
        if verbose:
            print(f"[fused-train STREAMING kernel: {epochs} epochs in "
                  f"{n_chunks} chunks of <= {chunk} "
                  f"({n} rows, batch {batchsize})]")
        keys_all = jax.random.split(key, epochs)
        p_new, mu_new, nu_new = list(tparams), mu, nu
        tls_l, vls_l, skips_l = [], [], []
        best = None
        best_vl = np.inf
        count = count0
        done = 0
        wt_dev = jnp.asarray(w_train) if weighted else None
        wv_dev = jnp.asarray(w_valid) if weighted else None
        while done < epochs:
            e_c = min(chunk, epochs - done)
            p_new, mu_new, nu_new, snaps, skips_c = run_fused_train_stream(
                plan, tcounts, p_new, masks, mask_slots, cparams,
                mu_new, nu_new, x_dev, theta, key,
                epochs=e_c, batchsize=batchsize, shuffle=shuffle,
                n_train=n, count0=count, lr=lr, b1=b1, b2=b2, eps=eps,
                w=w_train, guard_nonfinite=skip_nonfinite,
                epoch_keys=keys_all[done:done + e_c])
            p_new, mu_new, nu_new = (list(p_new), list(mu_new),
                                     list(nu_new))
            tls_c = np.asarray(eval_snapshots(
                list(snaps), list(cparams), x_dev, theta, wt_dev,
                plan=plan, tcounts=tuple(tcounts)))
            vls_c = np.asarray(eval_snapshots(
                list(snaps), list(cparams), xv_dev, theta_v, wv_dev,
                plan=plan, tcounts=tuple(tcounts)))
            tls_l.append(tls_c)
            vls_l.append(vls_c)
            c_skips = 0
            if skip_nonfinite:
                sk = np.asarray(skips_c)
                skips_l.append(sk)
                c_skips = int(sk.sum())
            count += e_c * n_batches - c_skips
            if track_best:
                arg = int(np.argmin(vls_c))
                c_best = float(vls_c[arg])
                if best is None or c_best < best_vl:
                    best = [s[arg] for s in snaps]
                    best_vl = c_best
            done += e_c
        tls = np.concatenate(tls_l)
        vls = np.concatenate(vls_l)
        skips = np.concatenate(skips_l) if skip_nonfinite else None
    elif chunk == epochs:
        p_new, mu_new, nu_new, tls, vls, best, skips = run_fused_train(
            plan, tcounts, tparams, masks, mask_slots, cparams, mu, nu,
            x_dev, theta, xv_dev, theta_v, key,
            epochs=epochs, batchsize=batchsize, shuffle=shuffle,
            count0=count0, lr=lr, b1=b1, b2=b2, eps=eps,
            track_best=track_best, w=w_train, w_valid=w_valid,
            guard_nonfinite=skip_nonfinite,
        )
        tls = np.asarray(tls)  # host fetch blocks on kernel completion
        vls = np.asarray(vls)
        skips = np.asarray(skips) if skip_nonfinite else None
    else:
        if verbose:
            n_chunks = -(-epochs // chunk)
            print(f"[fused-train kernel: {epochs} epochs in {n_chunks} "
                  f"chunks of <= {chunk} (slab/VMEM budget)]")
        keys_all = jax.random.split(key, epochs)
        p_new, mu_new, nu_new = list(tparams), mu, nu
        tls_l, vls_l, skips_l = [], [], []
        best = None
        best_vl = np.inf
        count = count0
        done = 0
        while done < epochs:
            e_c = min(chunk, epochs - done)
            out = run_fused_train(
                plan, tcounts, p_new, masks, mask_slots, cparams,
                mu_new, nu_new, x_dev, theta, xv_dev, theta_v, key,
                epochs=e_c, batchsize=batchsize, shuffle=shuffle,
                count0=count, lr=lr, b1=b1, b2=b2, eps=eps,
                track_best=track_best, w=w_train, w_valid=w_valid,
                guard_nonfinite=skip_nonfinite,
                epoch_keys=keys_all[done:done + e_c],
            )
            p_new, mu_new, nu_new = list(out[0]), list(out[1]), list(out[2])
            tls_c, vls_c = np.asarray(out[3]), np.asarray(out[4])
            tls_l.append(tls_c)
            vls_l.append(vls_c)
            c_skips = 0
            if skip_nonfinite:
                sk = np.asarray(out[6])
                skips_l.append(sk)
                c_skips = int(sk.sum())
            count += e_c * n_batches - c_skips
            if track_best:
                # the first chunk always seeds (kernel semantics: epoch 0
                # writes unconditionally); after that a NaN chunk minimum
                # never wins — matching the in-kernel `vl < prev_best`
                # comparison, which is false on NaN
                c_best = float(np.min(vls_c))
                if best is None or c_best < best_vl:
                    best, best_vl = out[5], c_best
            done += e_c
        tls = np.concatenate(tls_l)
        vls = np.concatenate(vls_l)
        skips = np.concatenate(skips_l) if skip_nonfinite else None
    elapsed = _time.perf_counter() - t0

    flow.model = unfold(list(p_new))
    flow.train_loss.extend(float(v) for v in tls)
    flow.valid_loss.extend(float(v) for v in vls)
    n_skipped = 0
    if skip_nonfinite:
        skips = np.asarray(skips)
        n_skipped = int(skips.sum())
        flow.skipped_updates.extend(int(v) for v in skips)

    ref_state = optax.adam(lr, b1=b1, b2=b2, eps=eps).init(flow.model)
    def zero_tpl():
        # fresh arrays per tree: mu/nu must not alias (the jnp program
        # donates the whole opt_state — shared buffers fail Execute())
        return jax.tree_util.tree_map(jnp.zeros_like, flow.model)

    new0 = ref_state[0]._replace(
        # skipped steps keep the old opt_state in train.py, so the Adam
        # count only advances on applied updates
        count=jnp.int32(count0 + epochs * n_batches - n_skipped),
        mu=unfold(list(mu_new), zero_tpl()),
        nu=unfold(list(nu_new), zero_tpl()),
    )
    out_state = (new0,) + tuple(ref_state[1:])

    if verbose and n_skipped:
        print(f"[skipped {n_skipped} non-finite updates]")
    if verbose:
        for e_i, (tl, vl) in enumerate(zip(tls, vls)):
            print(
                f"epoch: {len(flow.train_loss) - epochs + e_i + 1} | "
                f"train_loss = {tl}, valid_loss = {vl}"
            )
        sps = epochs * n / elapsed if elapsed > 0 else float("inf")
        print(f"[fused-train kernel | {elapsed:.2f}s incl. compile | "
              f"{sps:,.0f} samples/s]")
    if track_best:
        return out_state, unfold(list(best))
    return out_state


# -- mesh fused-step envelope (r5) -------------------------------------------

# measured crossover (benchmarks/step_kernel_probe.py, v5e): the
# grads-only step kernel beats the jnp step 3.4x at d5/h16/b64 and 1.6x
# at d16/h64/b1024, and LOSES 0.64x at d32/h256/b8192 — route only where
# the step is launch-bound
_STEP_MAX_WIDTH = 64
_STEP_MAX_D = 16
_STEP_MAX_LOCAL_BATCH = 1024


def fused_step_mesh_reason(flow, batchsize, mesh):
    """``None`` when the DP fused-step program applies, else the reason
    it does not (surfaced through ``flow.fused_decline_reason``)."""
    if not isinstance(flow.base, StandardNormal):
        return "non-StandardNormal base"
    if any(sz > 1 for name, sz in dict(mesh.shape).items()
           if name != "data"):
        return "non-DP mesh axes (fused-step DP shards 'data' only)"
    ndev = int(dict(mesh.shape).get("data", 1))
    if batchsize % ndev:
        return (f"batchsize {batchsize} not divisible by the data axis "
                f"({ndev})")
    if batchsize // ndev > _STEP_MAX_LOCAL_BATCH:
        return (f"per-device batch {batchsize // ndev} > "
                f"{_STEP_MAX_LOCAL_BATCH} (XLA wins there; "
                "benchmarks/step_kernel_probe.py)")
    if flow.metadata.d > _STEP_MAX_D:
        return (f"d={flow.metadata.d} > {_STEP_MAX_D} (XLA wins; "
                "benchmarks/step_kernel_probe.py)")
    try:
        _plan, _tc, tparams, *_rest = chain_train_fold(flow.model)
    except UnsupportedFusedTrain as e:
        return str(e)
    width = max([int(p.shape[-1]) for p in tparams
                 if getattr(p, "ndim", 0) == 2] + [1])
    if width > _STEP_MAX_WIDTH:
        return (f"conditioner width {width} > {_STEP_MAX_WIDTH} (XLA "
                "wins; benchmarks/step_kernel_probe.py)")
    return None
