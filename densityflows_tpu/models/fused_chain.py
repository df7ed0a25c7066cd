"""Whole-chain fusion: compile a FlowChain into one Pallas kernel pass.

Builds the static op *plan* + flat parameter list that
``ops/pallas_chain.py`` executes, and wraps the kernel in a
``jax.custom_vjp`` whose backward falls back to the pure-jnp per-layer
path — so the fused chain is safe to call anywhere (including under
``jax.grad``) while targeting the inference hot paths: the sampling sweep
(the reference's ``forward!`` fold, /root/reference/src/Chains.jl:187-197)
and density evaluation (/root/reference/src/Flows.jl:272-281).

Supported elements: RNVP/NICE couplings, Normalization, ActNorm,
Permutation, InvertibleLinear (LU), Logit. Chains containing anything else
(splines, MAF/IAF, embeddings) return ``None`` from
:func:`maybe_apply_fused` and keep the per-layer path.

**Measured routing (v5e, two-point scan timing — see
benchmarks/fused_chain_probe.py and the crossover table on
``models.layers.use_fused_chain``):** XLA vectorizes small-d chains on
the VPU at ~roofline (d=5, h=16: 373M rows/s log_prob vs 91M here), but
once the conditioner matmuls are MXU-worthy the one-kernel path wins
big — 1.43x at (d=16, h=64), 2.6–3.1x at h=128, 2.8x at the wide
config (d=32, h=256: 33M vs 12M rows/s; in-kernel sampler 37M vs 12M).
"auto" therefore routes here exactly when TPU ∧ rows ≥ 4096 ∧ d ≥ 16 ∧
hidden ≥ 64; ``set_fused_kernels(True/False)`` forces either way.

Training deliberately does NOT route here: ``nll_loss`` differentiates
``model.inverse``, whose per-layer fused kernels have real fused backward
kernels (ops/pallas_coupling.py); this module's custom-vjp backward
recomputes through the jnp oracle instead, which is correct but would
waste the fused forward under grad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import coupling as C
from ..ops.pallas_chain import (
    chain_vmem_bytes,
    op_param_count,
    pick_tile_rows,
    run_chain,
    run_chain_sample,
)
from .glow import ActNormLayer, InvertibleLinearLayer
from .layers import (
    JointRNVPCouplingLayer,
    NICECouplingLayer,
    RNVPCouplingLayer,
    use_fused_chain,
)
from .normalization import LogitLayer, NormalizationLayer, PermutationLayer

__all__ = ["maybe_apply_fused", "maybe_sample_fused", "chain_is_fusable"]


class _Unsupported(Exception):
    pass


def _inv_perm(perm):
    inv = np.empty(len(perm), np.int64)
    inv[list(perm)] = np.arange(len(perm))
    return tuple(int(i) for i in inv)


def _perm_matrix(perm, d):
    """(d, d) with m[perm[j], j] = 1 so that (x @ m)[:, j] = x[:, perm[j]]."""
    m = np.zeros((d, d), np.float32)
    for j, i in enumerate(perm):
        m[int(i), j] = 1.0
    return jnp.asarray(m)


def _coupling_entry(layer, dirn):
    """Fold the static split/recombine into the conditioner weights so the
    kernel does zero selection work (and x never enters a matmul):

    - first dense layer (K, H) with K = n + |id| splits into a θ part
      (n, H) and an x part zero-padded to (d, H) — ``u1 = θ@W1θ + x@W1x``
      reproduces ``h = [θ | x[:, id]]`` (the axis_nn ordering,
      src/Axes.jl:90-98) since the zero rows kill non-identity dims;
    - final dense layer (H, A) scatters into (H, d) columns at af
      positions (bias likewise), so the net emits d-wide s/t that are
      exactly 0 on identity dims — the elementwise transform
      ``y = x·exp(s_full) + t_full`` is then the whole coupling.
    """
    if isinstance(layer, JointRNVPCouplingLayer):
        return _joint_coupling_entry(layer, dirn)
    if isinstance(layer, RNVPCouplingLayer):
        kind, nets = "nvp", (layer.s_net, layer.t_net)
    else:
        kind, nets = "nice", (None, layer.t_net)
    s_net, t_net = nets
    ax = layer.axes
    if ax.transform_dim == 0 or ax.nn_input_dim == 0:
        raise _Unsupported  # degenerate masks keep the jnp path
    d, n = ax.d, ax.n
    id_idx = np.asarray(ax.axis_id, np.int32)
    af_idx = np.asarray(ax.axis_af, np.int32)
    has_th, has_id = n > 0, len(id_idx) > 0
    params = []

    def fold_net(net):
        has_bias = bool(net.biases[0].shape[0]) if net.biases else False
        ws = [jnp.asarray(w, jnp.float32) for w in net.weights]
        L = len(ws)
        w0 = ws[0]
        if has_th:
            params.append(w0[:n])
        if has_id:
            w1x = jnp.zeros((d, w0.shape[1]), jnp.float32)
            params.append(w1x.at[id_idx].set(w0[n:]))
        params.extend(ws[1:-1])
        wf = jnp.zeros((ws[-1].shape[0], d), jnp.float32)
        params.append(wf.at[:, af_idx].set(ws[-1]))
        if has_bias:
            for b in net.biases[:-1]:
                params.append(jnp.asarray(b, jnp.float32).reshape(1, -1))
            bf = jnp.zeros((1, d), jnp.float32)
            params.append(bf.at[0, af_idx].set(
                jnp.asarray(net.biases[-1], jnp.float32)))
        return L, net.activation, has_bias

    if kind == "nvp":
        n_s, act_s, bias_s = fold_net(s_net)
    else:
        n_s, act_s, bias_s = 0, "identity", False
    n_t, act_t, bias_t = fold_net(t_net)
    clamp = float(getattr(layer, "max_log_scale", 0.0))
    op = ("coupling", kind, dirn, n_s, n_t, act_s, act_t, bias_s, bias_t,
          has_th, has_id, clamp)
    return op, params


def _joint_coupling_entry(layer, dirn):
    """Joint (two-headed) coupling: the shared stack folds like a plain
    net, but the final (H, 2|af|) weight splits into TWO (H, d) folded
    heads — s columns scattered to af positions, t columns likewise —
    executed by the kernel's ``("coupling", "joint", …)`` op as ONE
    shared-stack pass + two head matmuls (ops/pallas_chain.py)."""
    net = layer.st_net
    ax = layer.axes
    if ax.transform_dim == 0 or ax.nn_input_dim == 0:
        raise _Unsupported
    d, n = ax.d, ax.n
    a = ax.transform_dim
    id_idx = np.asarray(ax.axis_id, np.int32)
    af_idx = np.asarray(ax.axis_af, np.int32)
    has_th, has_id = n > 0, len(id_idx) > 0
    has_bias = bool(net.biases[0].shape[0]) if net.biases else False
    ws = [jnp.asarray(w, jnp.float32) for w in net.weights]
    n_layers = len(ws)
    if n_layers < 2:
        raise _Unsupported  # a single dense layer has no shared stack

    params = []
    w0 = ws[0]
    if has_th:
        params.append(w0[:n])
    if has_id:
        w1x = jnp.zeros((d, w0.shape[1]), jnp.float32)
        params.append(w1x.at[id_idx].set(w0[n:]))
    params.extend(ws[1:-1])
    wf = ws[-1]  # (H, 2a): columns [:a] are the s head, [a:] the t head
    for head in (wf[:, :a], wf[:, a:]):
        scat = jnp.zeros((wf.shape[0], d), jnp.float32)
        params.append(scat.at[:, af_idx].set(head))
    if has_bias:
        for b in net.biases[:-1]:
            params.append(jnp.asarray(b, jnp.float32).reshape(1, -1))
        bf = jnp.asarray(net.biases[-1], jnp.float32)
        for head in (bf[:a], bf[a:]):
            scat = jnp.zeros((1, d), jnp.float32)
            params.append(scat.at[0, af_idx].set(head))
    op = ("coupling", "joint", dirn, n_layers, 0, net.activation,
          net.activation, has_bias, False, has_th, has_id,
          float(layer.max_log_scale))
    return op, params


def _normalization_entry(layer, dirn):
    lo = jax.lax.stop_gradient(layer.x_min).astype(jnp.float32)
    hi = jax.lax.stop_gradient(layer.x_max).astype(jnp.float32)
    diff = hi - lo
    delta = layer.beta - layer.alpha
    c = jnp.sum(jnp.log(diff / delta)).reshape(1, 1)
    if dirn == "fwd":  # [α,β] → [lo,hi] (reference Normalization.jl:79-92)
        a = diff / delta
        b = (layer.beta * lo - layer.alpha * hi) / delta
        return ("affine",), [a.reshape(1, -1), b.reshape(1, -1), c]
    a = delta / diff  # [lo,hi] → [α,β] (Normalization.jl:64-77)
    b = (layer.alpha * hi - layer.beta * lo) / diff
    return ("affine",), [a.reshape(1, -1), b.reshape(1, -1), -c]


def _actnorm_entry(layer, dirn):
    ls = layer.log_scale.astype(jnp.float32)
    bias = layer.bias.astype(jnp.float32)
    c = jnp.sum(ls).reshape(1, 1)
    if dirn == "fwd":  # x = z·e⁻ˢ + b
        a = jnp.exp(-ls)
        return ("affine",), [a.reshape(1, -1), bias.reshape(1, -1), -c]
    a = jnp.exp(ls)  # z = (x − b)·eˢ
    return ("affine",), [a.reshape(1, -1), (-bias * a).reshape(1, -1), c]


def _invlinear_entry(layer, dirn):
    from jax.scipy.linalg import solve_triangular

    c = jnp.sum(layer.log_s.astype(jnp.float32)).reshape(1, 1)
    if dirn == "inv":  # z = x @ Wᵀ
        return ("linear",), [layer._w().T.astype(jnp.float32), c]
    # forward: x = z @ W⁻ᵀ; W⁻¹ = U⁻¹ L⁻¹ Π with Π y = y[inv_perm]
    l, u = layer._lu()
    d = layer.d
    e = jnp.eye(d, dtype=jnp.float32)[list(layer._inv_perm()), :]
    w_inv = solve_triangular(
        u.astype(jnp.float32),
        solve_triangular(l.astype(jnp.float32), e, lower=True,
                         unit_diagonal=True),
        lower=False,
    )
    return ("linear",), [w_inv.T, -c]


def _logit_entry(layer, dirn):
    lo = layer.lo.astype(jnp.float32).reshape(1, -1)
    hi = layer.hi.astype(jnp.float32).reshape(1, -1)
    wlog = jnp.log(hi - lo)
    return ("logit", dirn, float(layer.eps)), [lo, hi, wlog]


def _entry(layer, dirn):
    if isinstance(layer, (RNVPCouplingLayer, NICECouplingLayer,
                          JointRNVPCouplingLayer)):
        return _coupling_entry(layer, dirn)
    if isinstance(layer, NormalizationLayer):
        return _normalization_entry(layer, dirn)
    if isinstance(layer, ActNormLayer):
        return _actnorm_entry(layer, dirn)
    if isinstance(layer, InvertibleLinearLayer):
        return _invlinear_entry(layer, dirn)
    if isinstance(layer, PermutationLayer):
        d = len(layer.perm)
        zero = jnp.zeros((1, 1), jnp.float32)
        perm = layer.perm if dirn == "fwd" else _inv_perm(layer.perm)
        return ("linear",), [_perm_matrix(perm, d), zero]
    if isinstance(layer, LogitLayer):
        return _logit_entry(layer, dirn)
    raise _Unsupported


def _iter_layers(chain, dirn):
    # blocks may nest one level (CouplingBlock holds layer_1/layer_2)
    from .blocks import CouplingBlock

    seq = chain.layers if dirn == "fwd" else tuple(reversed(chain.layers))
    for layer in seq:
        if isinstance(layer, CouplingBlock):
            pair = (layer.layer_1, layer.layer_2)
            yield from pair if dirn == "fwd" else reversed(pair)
        else:
            yield layer


def _plan_params(chain, dirn):
    plan, params = [], []
    for layer in _iter_layers(chain, dirn):
        op, p = _entry(layer, dirn)
        assert len(p) == op_param_count(op)
        plan.append(op)
        params.extend(p)
    if not plan:
        raise _Unsupported
    return tuple(plan), params


def _max_hidden(chain) -> int:
    """Widest conditioner hidden layer — the quantity the measured
    auto-gate thresholds on (layers.use_fused_chain)."""
    h = 0
    for layer in _iter_layers(chain, "fwd"):
        for net in _conditioner_nets(layer):
            for w in net.weights[:-1]:
                h = max(h, int(np.shape(w)[-1]))
    return h


def _conditioner_nets(layer):
    if isinstance(layer, RNVPCouplingLayer):
        return (layer.s_net, layer.t_net)
    if isinstance(layer, NICECouplingLayer):
        return (layer.t_net,)
    if isinstance(layer, JointRNVPCouplingLayer):
        return (layer.st_net,)
    return ()


def _has_joint(chain) -> bool:
    """Chains containing a joint conditioner route under the joint
    crossover thresholds (stricter — see layers.use_fused_chain)."""
    return any(isinstance(l, JointRNVPCouplingLayer)
               for l in _iter_layers(chain, "fwd"))


def chain_is_fusable(chain, d: int, n: int) -> bool:
    """Static feasibility check (types + VMEM budget), no tracing."""
    try:
        from .blocks import CouplingBlock

        shapes = []
        for layer in _iter_layers(chain, "fwd"):
            if isinstance(layer, (RNVPCouplingLayer, NICECouplingLayer,
                                  JointRNVPCouplingLayer)):
                if layer.axes.transform_dim == 0 or layer.axes.nn_input_dim == 0:
                    return False
                if (isinstance(layer, JointRNVPCouplingLayer)
                        and len(layer.st_net.weights) < 2):
                    return False
                for net in _conditioner_nets(layer):
                    shapes.extend(net.weights)
            elif isinstance(layer, InvertibleLinearLayer):
                shapes.append(layer.lower)
            elif isinstance(layer, (NormalizationLayer, ActNormLayer,
                                    PermutationLayer, LogitLayer)):
                pass
            else:
                return False
        param_bytes = sum(int(np.prod(np.shape(w))) * 4 for w in shapes)
        widest = max(
            [int(np.shape(w)[-1]) for w in shapes] + [d + n]
        )
        # mirrors chain_vmem_bytes at the smallest tile
        return param_bytes + 2 * 128 * (d + n + widest * 3) * 4 < 9_000_000
    except Exception:
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _chain_fused(chain, x2, th2, dirn, with_ldj):
    plan, params = _plan_params(chain, dirn)
    return run_chain(plan, params, x2, th2, with_ldj=with_ldj)


def _layer_jnp(layer, y, theta, dirn):
    """Per-layer pure-jnp apply (the correctness oracle) — couplings
    bypass their own fused-kernel dispatch."""
    if isinstance(layer, RNVPCouplingLayer):
        y_id, y_af, s, t = layer._conditioner(y, theta)
        out, ldj = (C.rnvp_forward(s, t, y_af) if dirn == "fwd"
                    else C.rnvp_backward(s, t, y_af))
        return C.recombine_features(y_id, out, layer.axes), ldj
    if isinstance(layer, NICECouplingLayer):
        y_id, y_af, t = layer._conditioner(y, theta)
        out, ldj = (C.nice_forward(t, y_af) if dirn == "fwd"
                    else C.nice_backward(t, y_af))
        return C.recombine_features(y_id, out, layer.axes), ldj
    return layer.forward(y, theta) if dirn == "fwd" else layer.inverse(y, theta)


def _jnp_chain(chain, x2, th2, dirn, with_ldj):
    y, ldj = x2, None
    for layer in _iter_layers(chain, dirn):
        y, ldj_i = _layer_jnp(layer, y, th2, dirn)
        ldj = ldj_i if ldj is None else ldj + ldj_i
    return (y, ldj) if with_ldj else y


def _chain_fused_fwd(chain, x2, th2, dirn, with_ldj):
    return _chain_fused(chain, x2, th2, dirn, with_ldj), (chain, x2, th2)


def _chain_fused_bwd(dirn, with_ldj, res, g):
    chain, x2, th2 = res
    _, vjp = jax.vjp(
        lambda c, xx, tt: _jnp_chain(c, xx, tt, dirn, with_ldj),
        chain, x2, th2,
    )
    return vjp(g)


_chain_fused.defvjp(_chain_fused_fwd, _chain_fused_bwd)


@functools.partial(jax.jit, static_argnames=("rows", "d"))
def _sample_fused_prog(chain, seed, theta_n, rows, d):
    plan, params = _plan_params(chain, "fwd")
    return run_chain_sample(plan, params, seed, rows, d, theta_n)


def maybe_sample_fused(chain, key, rows, d, theta_n):
    """One output-only kernel: in-kernel N(0,I) draw (Box–Muller on the
    per-core PRNG) + the full forward_ sweep. ``theta_n`` may be (1, n)
    — one θ broadcast to every draw without materializing (rows, n) in
    HBM. Returns (rows, d) or None when the chain isn't fusable.

    Draws are deterministic in ``key`` but are a different stream from
    ``jax.random.normal`` (bit-reproducibility across framework versions
    is not part of the sampling contract; determinism per key is).
    """
    n = theta_n.shape[-1] if theta_n is not None else 0
    if jax.default_backend() != "tpu":
        # the CPU interpreter stubs prng_random_bits to zeros — the
        # in-kernel draw is a real-TPU-only fast path
        return None
    if not use_fused_chain(rows, d, _max_hidden(chain), _has_joint(chain)):
        return None
    if not chain_is_fusable(chain, d, n):
        return None
    seed = jax.random.key_data(key).reshape(-1)[:2].astype(jnp.int32)
    try:
        return _sample_fused_prog(chain, seed, theta_n, rows, d)
    except Exception:
        return None


def maybe_apply_fused(chain, y, theta, dirn, with_ldj):
    """Run the whole chain as one fused kernel if supported & worthwhile;
    returns None to keep the per-layer path. ``dirn``: "fwd" | "inv"."""
    if y.ndim < 2:
        return None
    batch_shape = y.shape[:-1]
    rows = int(np.prod(batch_shape))
    d = y.shape[-1]
    n = theta.shape[-1] if theta is not None else 0
    if not use_fused_chain(rows, d, _max_hidden(chain), _has_joint(chain)):
        return None
    if not chain_is_fusable(chain, d, n):
        return None
    x2 = y.reshape(rows, d)
    th2 = (theta.reshape(rows, n) if theta is not None
           else jnp.zeros((rows, 0), y.dtype))
    try:
        out = _chain_fused(chain, x2, th2, dirn, with_ldj)
    except Exception:
        return None  # e.g. unsupported transform under vmap — keep jnp path
    if with_ldj:
        yy, ldj = out
        return yy.reshape(y.shape), ldj.reshape(batch_shape)
    return out.reshape(y.shape)
