"""Fused Pallas TPU kernels for affine coupling layers.

The hot op of the whole framework: conditioner MLPs (s, t) + affine
transform + log-det-Jacobian in ONE VMEM-resident pass over the batch.
This is the TPU-native replacement for the reference's hand-written
ChainRules ``rrule``s (/root/reference/src/affine/RNVP.jl:99-147,
/root/reference/src/affine/NICE.jl:84-115): where the reference needed a
custom adjoint to work around Zygote, we need one to pair the fused
forward kernel with a fused backward kernel (``jax.custom_vjp``), with the
same pullback algebra (note the g_ldj coupling into ds, RNVP.jl:119-143).

Design (see /opt/skills/guides/pallas_guide.md):

- grid = 1D over batch tiles of ``TB`` rows; each grid step loads one
  (TB, K) conditioner-input tile + one (TB, A) transform tile into VMEM,
  runs both MLP chains on the MXU (fp32 accumulation), applies the affine
  map and the ldj row-sum on the VPU, and writes (TB, A) + (TB, 1) out —
  intermediates never touch HBM;
- weights/biases use constant index maps so they stay VMEM-resident
  across grid steps (they are tiny: hidden ≤ 512);
- the backward kernel rematerializes the MLP activations per tile
  (recompute beats storing TB×H×L residuals in HBM) and accumulates
  dW/db across grid steps in revisited output blocks (init on the first
  grid step, ``+=`` after — TPU grids are sequential per core);
- callers pad the batch to a multiple of ``TB`` with zero rows (zero
  cotangents ⇒ padded rows contribute exactly 0 to dW/db — no masking
  needed in-kernel);
- on CPU backends the kernels run in interpreter mode so the same code
  path is exercised by the test suite.

The pure-jnp implementations in ``ops.coupling``/``ops.mlp`` remain the
correctness oracle; ``tests/test_pallas.py`` grad-checks these kernels
against them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pallas_available",
    "fused_coupling",
    "fused_coupling_nvp",
    "fused_coupling_nice",
]

# default batch-tile rows; 512×(K+A+H)×4B stays far below the 16 MB VMEM
DEFAULT_TB = 512


def set_tile_rows(tb: int) -> None:
    """Override the batch-tile row count (read at trace time; call
    ``jax.clear_caches()`` to retrace already-compiled programs)."""
    global DEFAULT_TB
    if tb < 8 or tb % 8:
        raise ValueError("tile rows must be a multiple of 8 and >= 8")
    DEFAULT_TB = int(tb)


def pallas_available() -> bool:
    """True when the default backend can run these kernels compiled."""
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    # interpreter mode on CPU so tests exercise the kernel code path
    return jax.default_backend() != "tpu"


# -- activation forward / derivative (by static name) -----------------------

_SQRT_2_OVER_PI = 0.7978845608028654


def _act_fwd(name, u):
    if name == "identity":
        return u
    if name == "relu":
        return jnp.maximum(u, 0.0)
    if name == "tanh":
        return jnp.tanh(u)
    if name == "sigmoid":
        return jax.nn.sigmoid(u)
    if name == "silu":
        return u * jax.nn.sigmoid(u)
    if name == "gelu":
        inner = _SQRT_2_OVER_PI * (u + 0.044715 * u * u * u)
        return 0.5 * u * (1.0 + jnp.tanh(inner))
    if name == "softplus":
        return jax.nn.softplus(u)
    if name == "elu":
        return jnp.where(u > 0, u, jnp.expm1(u))
    if name == "leaky_relu":
        return jnp.where(u >= 0, u, 0.01 * u)
    raise ValueError(f"unsupported activation for fused kernel: {name}")


def _act_grad(name, u):
    """dact/du as a function of the PRE-activation u."""
    if name == "identity":
        return jnp.ones_like(u)
    if name == "relu":
        return (u > 0).astype(u.dtype)
    if name == "tanh":
        th = jnp.tanh(u)
        return 1.0 - th * th
    if name == "sigmoid":
        s = jax.nn.sigmoid(u)
        return s * (1.0 - s)
    if name == "silu":
        s = jax.nn.sigmoid(u)
        return s * (1.0 + u * (1.0 - s))
    if name == "gelu":
        u3 = u * u * u
        inner = _SQRT_2_OVER_PI * (u + 0.044715 * u3)
        th = jnp.tanh(inner)
        dinner = _SQRT_2_OVER_PI * (1.0 + 3 * 0.044715 * u * u)
        return 0.5 * (1.0 + th) + 0.5 * u * (1.0 - th * th) * dinner
    if name == "softplus":
        return jax.nn.sigmoid(u)
    if name == "elu":
        return jnp.where(u > 0, 1.0, jnp.exp(u))
    if name == "leaky_relu":
        return jnp.where(u >= 0, 1.0, 0.01).astype(u.dtype)
    raise ValueError(f"unsupported activation for fused kernel: {name}")


def _mlp_fwd_in_kernel(h, w_refs, b_refs, act):
    """Run one MLP chain on a VMEM tile; returns the (unactivated) output
    in fp32. Final layer is linear (reference src/Layers.jl:41).

    Compute is pinned to fp32 even for bf16-stored weights (upcast on
    load): measured on v5e, bf16 MXU passes at these conditioner sizes
    (hidden ≤ 512) LOSE ~2x to Mosaic's bf16 relayout overhead — bf16
    here buys storage, not speed."""
    a = h
    n = len(w_refs)
    for i in range(n):
        u = jnp.dot(a, w_refs[i][:].astype(jnp.float32),
                    preferred_element_type=jnp.float32)
        if b_refs[i] is not None:
            u = u + b_refs[i][:].astype(jnp.float32)
        a = _act_fwd(act, u) if i < n - 1 else u
    return a


def _mlp_fwd_keep(h, w_refs, b_refs, act):
    """Like :func:`_mlp_fwd_in_kernel` but returns (out, pre_acts, acts)
    for the backward chain. ``acts[i]`` is the input to layer i."""
    a = h
    pre, acts = [], [a]
    n = len(w_refs)
    for i in range(n):
        u = jnp.dot(a, w_refs[i][:].astype(jnp.float32),
                    preferred_element_type=jnp.float32)
        if b_refs[i] is not None:
            u = u + b_refs[i][:].astype(jnp.float32)
        pre.append(u)
        a = _act_fwd(act, u) if i < n - 1 else u
        if i < n - 1:
            acts.append(a)
    return a, pre, acts


def _mlp_bwd_in_kernel(delta, pre, acts, w_refs, act, dw_refs, db_refs, dh_acc,
                       is_first):
    """Backward through one MLP chain. ``delta`` is the cotangent of the
    (linear) output. Accumulates dW/db into revisited output blocks and
    returns the cotangent w.r.t. the chain input added to ``dh_acc``."""
    n = len(w_refs)
    for i in range(n - 1, -1, -1):
        # dW_i = acts[i]^T @ delta, accumulated across batch tiles (f32
        # compute — see _mlp_fwd_in_kernel on why not bf16)
        dw = jax.lax.dot_general(
            acts[i], delta,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(is_first)
        def _(dw_ref=dw_refs[i], dw=dw):
            dw_ref[:] = dw

        @pl.when(jnp.logical_not(is_first))
        def _(dw_ref=dw_refs[i], dw=dw):
            dw_ref[:] = dw_ref[:] + dw

        if db_refs[i] is not None:
            db = jnp.sum(delta, axis=0, keepdims=True)

            @pl.when(is_first)
            def _(db_ref=db_refs[i], db=db):
                db_ref[:] = db

            @pl.when(jnp.logical_not(is_first))
            def _(db_ref=db_refs[i], db=db):
                db_ref[:] = db_ref[:] + db

        delta = jax.lax.dot_general(
            delta, w_refs[i][:].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if i > 0:
            delta = delta * _act_grad(act, pre[i - 1])
    return dh_acc + delta if dh_acc is not None else delta


# -- kernel builders --------------------------------------------------------


def _split_refs(refs, counts):
    out, k = [], 0
    for c in counts:
        out.append(refs[k : k + c])
        k += c
    return out


def _fwd_kernel(kind, direction, with_ldj, n_s, n_t, act_s, act_t,
                has_bias_s, has_bias_t, refs):
    """Shared forward-kernel body. Ref order: h, y_af, ws..., (bs...),
    wt..., (bt...), out_y, (out_ldj)."""
    i = 0
    h_ref = refs[i]; i += 1
    y_ref = refs[i]; i += 1
    ws = refs[i : i + n_s]; i += n_s
    bs = refs[i : i + n_s] if has_bias_s else [None] * n_s
    i += n_s if has_bias_s else 0
    wt = refs[i : i + n_t]; i += n_t
    bt = refs[i : i + n_t] if has_bias_t else [None] * n_t
    i += n_t if has_bias_t else 0
    out_y = refs[i]; i += 1
    out_ldj = refs[i] if with_ldj else None

    h = h_ref[:].astype(jnp.float32)
    y = y_ref[:].astype(jnp.float32)

    t = _mlp_fwd_in_kernel(h, wt, bt, act_t)
    if kind == "nvp":
        s = _mlp_fwd_in_kernel(h, ws, bs, act_s)
        if direction == "forward":
            out = y * jnp.exp(s) + t
            if with_ldj:
                out_ldj[:] = jnp.sum(s, axis=-1, keepdims=True)
        else:
            out = (y - t) * jnp.exp(-s)
            if with_ldj:
                out_ldj[:] = -jnp.sum(s, axis=-1, keepdims=True)
    else:  # nice: volume-preserving, s ≡ 0 (reference NICE.jl:63-81)
        out = y + t if direction == "forward" else y - t
        if with_ldj:
            out_ldj[:] = jnp.zeros(out.shape[:-1] + (1,), jnp.float32)
    out_y[:] = out.astype(out_y.dtype)


def _bwd_kernel(kind, direction, n_s, n_t, act_s, act_t,
                has_bias_s, has_bias_t, refs):
    """Backward-kernel body (rematerialized forward + fused pullback).

    Ref order: h, y_af, ws..., (bs...), wt..., (bt...), g_y, g_ldj,
    then outputs: dh, dy, dws..., (dbs...), dwt..., (dbt...).

    Pullback algebra (reference RNVP.jl:119-143, SURVEY.md §7 hard parts):

      forward  x = y·eˢ + t, ldj=+Σs:  dy = g·eˢ;  dt = g;
                                       ds = g·y·eˢ + g_ldj
      inverse  z = (y−t)·e⁻ˢ, ldj=−Σs: dy = g·e⁻ˢ; dt = −g·e⁻ˢ;
                                       ds = −g·z − g_ldj
    """
    i = 0
    h_ref = refs[i]; i += 1
    y_ref = refs[i]; i += 1
    ws = refs[i : i + n_s]; i += n_s
    bs = refs[i : i + n_s] if has_bias_s else [None] * n_s
    i += n_s if has_bias_s else 0
    wt = refs[i : i + n_t]; i += n_t
    bt = refs[i : i + n_t] if has_bias_t else [None] * n_t
    i += n_t if has_bias_t else 0
    gy_ref = refs[i]; i += 1
    gldj_ref = refs[i]; i += 1
    dh_ref = refs[i]; i += 1
    dy_ref = refs[i]; i += 1
    dws = refs[i : i + n_s]; i += n_s
    dbs = refs[i : i + n_s] if has_bias_s else [None] * n_s
    i += n_s if has_bias_s else 0
    dwt = refs[i : i + n_t]; i += n_t
    dbt = refs[i : i + n_t] if has_bias_t else [None] * n_t

    is_first = pl.program_id(0) == 0
    h = h_ref[:].astype(jnp.float32)
    y = y_ref[:].astype(jnp.float32)
    g = gy_ref[:].astype(jnp.float32)
    g_ldj = gldj_ref[:].astype(jnp.float32)  # (TB, 1)

    t_out, t_pre, t_acts = _mlp_fwd_keep(h, wt, bt, act_t)

    if kind == "nvp":
        s_out, s_pre, s_acts = _mlp_fwd_keep(h, ws, bs, act_s)
        if direction == "forward":
            es = jnp.exp(s_out)
            dy = g * es
            dt = g
            ds = g * y * es + g_ldj
        else:
            ems = jnp.exp(-s_out)
            z = (y - t_out) * ems
            dy = g * ems
            dt = -dy
            ds = -g * z - g_ldj
        dh = _mlp_bwd_in_kernel(ds, s_pre, s_acts, ws, act_s, dws, dbs,
                                None, is_first)
        dh = _mlp_bwd_in_kernel(dt, t_pre, t_acts, wt, act_t, dwt, dbt,
                                dh, is_first)
    else:
        dy = g
        dt = g if direction == "forward" else -g
        dh = _mlp_bwd_in_kernel(dt, t_pre, t_acts, wt, act_t, dwt, dbt,
                                None, is_first)

    dh_ref[:] = dh.astype(dh_ref.dtype)
    dy_ref[:] = dy.astype(dy_ref.dtype)


# -- pallas_call assembly ---------------------------------------------------


def _row_spec(cols, tb):
    return pl.BlockSpec((tb, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _weight_arrays(net):
    """(weights2d, biases2d|None, n_layers, act, has_bias) from an MLP pytree."""
    ws = [jnp.asarray(w) for w in net.weights]
    has_bias = bool(net.biases[0].shape[0]) if net.biases else False
    bs = [jnp.asarray(b).reshape(1, -1) for b in net.biases] if has_bias else None
    return ws, bs, len(ws), net.activation, has_bias


@functools.partial(
    jax.jit,
    static_argnames=(
        "kind", "direction", "with_ldj", "n_s", "n_t", "act_s", "act_t",
        "has_bias_s", "has_bias_t", "tb", "interpret",
    ),
)
def _run_fwd(h, y_af, flat_params, *, kind, direction, with_ldj, n_s, n_t,
             act_s, act_t, has_bias_s, has_bias_t, tb, interpret):
    B, K = h.shape
    A = y_af.shape[-1]
    grid = (pl.cdiv(B, tb),)
    in_specs = [_row_spec(K, tb), _row_spec(A, tb)]
    in_specs += [_const_spec(p.shape) for p in flat_params]
    out_shape = [jax.ShapeDtypeStruct((B, A), y_af.dtype)]
    out_specs = [_row_spec(A, tb)]
    if with_ldj:
        out_shape.append(jax.ShapeDtypeStruct((B, 1), jnp.float32))
        out_specs.append(_row_spec(1, tb))

    kernel = functools.partial(
        _kernel_entry_fwd, kind, direction, with_ldj, n_s, n_t,
        act_s, act_t, has_bias_s, has_bias_t,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
        interpret=interpret,
    )(h, y_af, *flat_params)
    return out


def _kernel_entry_fwd(kind, direction, with_ldj, n_s, n_t, act_s, act_t,
                      has_bias_s, has_bias_t, *refs):
    _fwd_kernel(kind, direction, with_ldj, n_s, n_t, act_s, act_t,
                has_bias_s, has_bias_t, refs)


def _kernel_entry_bwd(kind, direction, n_s, n_t, act_s, act_t,
                      has_bias_s, has_bias_t, *refs):
    _bwd_kernel(kind, direction, n_s, n_t, act_s, act_t,
                has_bias_s, has_bias_t, refs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "kind", "direction", "n_s", "n_t", "act_s", "act_t",
        "has_bias_s", "has_bias_t", "tb", "interpret",
    ),
)
def _run_bwd(h, y_af, flat_params, g_y, g_ldj, *, kind, direction, n_s, n_t,
             act_s, act_t, has_bias_s, has_bias_t, tb, interpret):
    B, K = h.shape
    A = y_af.shape[-1]
    grid = (pl.cdiv(B, tb),)
    in_specs = [_row_spec(K, tb), _row_spec(A, tb)]
    in_specs += [_const_spec(p.shape) for p in flat_params]
    in_specs += [_row_spec(A, tb), _row_spec(1, tb)]
    out_shape = [
        jax.ShapeDtypeStruct((B, K), jnp.float32),
        jax.ShapeDtypeStruct((B, A), jnp.float32),
    ]
    out_specs = [_row_spec(K, tb), _row_spec(A, tb)]
    for p in flat_params:
        out_shape.append(jax.ShapeDtypeStruct(p.shape, jnp.float32))
        out_specs.append(_const_spec(p.shape))

    kernel = functools.partial(
        _kernel_entry_bwd, kind, direction, n_s, n_t,
        act_s, act_t, has_bias_s, has_bias_t,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(h, y_af, *flat_params, g_y, g_ldj)


# -- public custom-vjp op ---------------------------------------------------


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11),
)
def _fused_coupling_core(h, y_af, flat_params, kind, direction, with_ldj,
                         n_s, n_t, act_s, act_t, has_bias_s, has_bias_t):
    tb = min(DEFAULT_TB, max(8, h.shape[0]))
    out = _run_fwd(
        h, y_af, tuple(flat_params), kind=kind, direction=direction,
        with_ldj=with_ldj, n_s=n_s, n_t=n_t, act_s=act_s, act_t=act_t,
        has_bias_s=has_bias_s, has_bias_t=has_bias_t, tb=tb,
        interpret=_interpret(),
    )
    if with_ldj:
        return out[0], out[1][:, 0]
    return out


def _fused_fwd_rule(h, y_af, flat_params, kind, direction, with_ldj,
                    n_s, n_t, act_s, act_t, has_bias_s, has_bias_t):
    out = _fused_coupling_core(
        h, y_af, flat_params, kind, direction, with_ldj,
        n_s, n_t, act_s, act_t, has_bias_s, has_bias_t,
    )
    return out, (h, y_af, tuple(flat_params))


def _fused_bwd_rule(kind, direction, with_ldj, n_s, n_t, act_s, act_t,
                    has_bias_s, has_bias_t, residuals, g):
    h, y_af, flat_params = residuals
    if with_ldj:
        g_y, g_ldj = g
        g_ldj = g_ldj.reshape(-1, 1).astype(jnp.float32)
    else:
        g_y = g
        g_ldj = jnp.zeros((h.shape[0], 1), jnp.float32)
    tb = min(DEFAULT_TB, max(8, h.shape[0]))
    outs = _run_bwd(
        h, y_af, flat_params, g_y, g_ldj, kind=kind, direction=direction,
        n_s=n_s, n_t=n_t, act_s=act_s, act_t=act_t,
        has_bias_s=has_bias_s, has_bias_t=has_bias_t, tb=tb,
        interpret=_interpret(),
    )
    dh, dy = outs[0], outs[1]
    dparams = tuple(
        dp.astype(p.dtype) if dp.ndim == 2 and p.ndim == 2 else dp
        for dp, p in zip(outs[2:], flat_params)
    )
    return dh.astype(h.dtype), dy.astype(y_af.dtype), dparams


_fused_coupling_core.defvjp(_fused_fwd_rule, _fused_bwd_rule)


def _pad_rows(a, tb):
    pad = (-a.shape[0]) % tb
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)
    return a, pad


def fused_coupling(s_net, t_net, h, y_af, *, direction, with_ldj=True):
    """Fused coupling transform on 2D tiles.

    ``h``: (B, K) conditioner input (θ ⊕ identity dims); ``y_af``: (B, A)
    the transformed features (z_af for ``direction='forward'``, x_af for
    ``'inverse'``). ``s_net=None`` selects the NICE (additive) transform.
    Returns ``(y_out, ldj)`` with ldj of shape (B,), or just ``y_out``
    when ``with_ldj=False``.
    """
    kind = "nice" if s_net is None else "nvp"
    wt, bt, n_t, act_t, has_bias_t = _weight_arrays(t_net)
    if s_net is not None:
        ws, bs, n_s, act_s, has_bias_s = _weight_arrays(s_net)
    else:
        ws, bs, n_s, act_s, has_bias_s = [], None, 0, "identity", False

    flat = list(ws)
    if has_bias_s:
        flat += list(bs)
    flat += list(wt)
    if has_bias_t:
        flat += list(bt)

    B = h.shape[0]
    tb = min(DEFAULT_TB, max(8, B))
    h_p, pad = _pad_rows(h, tb)
    y_p, _ = _pad_rows(y_af, tb)

    out = _fused_coupling_core(
        h_p, y_p, tuple(flat), kind, direction, with_ldj,
        n_s, n_t, act_s, act_t, has_bias_s, has_bias_t,
    )
    if with_ldj:
        y_out, ldj = out
        if pad:
            y_out, ldj = y_out[:B], ldj[:B]
        return y_out, ldj
    return out[:B] if pad else out


def fused_coupling_nvp(s_net, t_net, h, y_af, *, direction, with_ldj=True):
    """RealNVP fused coupling (reference math RNVP.jl:77-96, 168-187)."""
    return fused_coupling(s_net, t_net, h, y_af, direction=direction,
                          with_ldj=with_ldj)


def fused_coupling_nice(t_net, h, y_af, *, direction, with_ldj=True):
    """NICE fused coupling (reference math NICE.jl:63-81, 135-153)."""
    return fused_coupling(None, t_net, h, y_af, direction=direction,
                          with_ldj=with_ldj)
