"""Grads-only fused STEP kernel: one batch's loss + gradients in one pass.

The whole-run (ops/pallas_train.py) and streaming (pallas_train_stream)
kernels fuse Adam into the kernel, which is exactly right on one chip —
but data-parallel training needs a gradient psum BETWEEN the backward
pass and the update, so neither composes with a mesh. This kernel stops
at the gradients:

    grid over batch tiles
      tile 0: zero the accumulator blocks
      each tile: inverse fold -> masked-NLL contribution -> hand-derived
          backward -> grads ACCUMULATED into resident VMEM blocks

Under ``shard_map`` each device runs it on its local batch shard, XLA
inserts the ``psum`` over ICI, and the (tiny) Adam update runs in XLA on
the folded params — the launch-bound sequence of ~50 micro-kernels that
makes small-config DP steps slow collapses into one kernel + one
collective + one fused update (probe: benchmarks/step_kernel_probe.py;
the loop being replaced: /root/reference/src/Flows.jl:396-417).

The loss normalization ``denom = Σ mask`` spans the GLOBAL batch, so it
is computed outside (one psum under a mesh) and passed in — each tile
contributes ``−Σ m·lp / denom`` and the cotangents scale the same way,
making per-tile gradient accumulation exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_train import (
    _LOG_2PI,
    _offsets,
    _op_is_trainable,
    _plan_bwd,
    _plan_fwd,
)

__all__ = ["run_fused_grads", "grads_vmem_bytes", "folded_nll"]


def _step_kernel(plan, offsets, mask_slots, cfg, *refs):
    """cfg: (n, d, tile, n_tiles, n_t, n_c, n_m) — all static."""
    n, d, tile_rows, n_tiles, n_t, n_c, n_m = cfg
    i = 0
    x_ref = refs[i]; i += 1
    th_ref = None
    if n:
        th_ref = refs[i]; i += 1
    m_ref = refs[i]; i += 1
    denom_ref = refs[i]; i += 1
    p_in = refs[i:i + n_t]; i += n_t
    mask_refs = refs[i:i + n_m]; i += n_m
    c_flat = refs[i:i + n_c]; i += n_c
    loss_out = refs[i]; i += 1
    g_out = refs[i:i + n_t]

    t_refs, c_refs = [], []
    ci = 0
    for op_i, op in enumerate(plan):
        if _op_is_trainable(op):
            o = offsets[op_i]
            cnt = offsets[op_i + 1] - o if op_i + 1 < len(offsets) \
                else n_t - o
            t_refs.append(p_in[o:o + cnt])
            c_refs.append(())
        else:
            t_refs.append(())
            c_refs.append(c_flat[ci:ci + 3])
            ci += 3

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _zero():
        loss_out[:] = jnp.zeros(loss_out.shape, jnp.float32)
        for k in range(n_t):
            g_out[k][:] = jnp.zeros(g_out[k].shape, jnp.float32)

    x = x_ref[0].astype(jnp.float32)
    th = th_ref[0].astype(jnp.float32) if th_ref is not None else None
    mask = m_ref[0].astype(jnp.float32)
    denom = denom_ref[0, 0]

    z, ldj, caches = _plan_fwd(plan, t_refs, c_refs, x, th, True)
    lp = -0.5 * jnp.sum(z * z, axis=-1, keepdims=True) \
        - 0.5 * d * _LOG_2PI + ldj
    loss_t = -jnp.sum(lp * mask) / denom
    jbar = -mask / denom
    gz = -jbar * z
    grads = _plan_bwd(plan, caches, th, gz, jbar, offsets, n_t)

    loss_out[:] = loss_out[:] + loss_t
    for k in range(n_t):
        g = grads[k]
        slot = mask_slots[k]
        if slot is not None:
            g = jnp.where(mask_refs[slot][:] > 0.5, g, 0.0)
        g_out[k][:] = g_out[k][:] + g


def grads_vmem_bytes(plan, tparams, cparams, tile, d, n) -> int:
    """Resident working set: tile blocks (double-buffered), params +
    grad accumulators, one tile's activations."""
    lane = 128

    def param_bytes(p):
        return max(int(np.prod(p.shape)) * 4, 8 * lane * 4)

    tile_blk = 2 * tile * (max(d, lane) + (max(n, lane) if n else 0)
                           + lane) * 4
    params = 2 * sum(param_bytes(p) for p in tparams) \
        + sum(param_bytes(p) for p in tparams)  # p + grads + masks
    consts = sum(param_bytes(p) for p in cparams)
    widest = max([int(p.shape[-1]) for p in tparams if p.ndim == 2] + [d])
    n_hidden = sum(max(op[3], op[4]) for op in plan if op[0] == "coupling")
    acts = (2 + n_hidden) * tile * max(widest, lane) * 4
    return tile_blk + params + consts + acts


@functools.partial(
    jax.jit,
    static_argnames=("plan", "tcounts", "mask_slots", "tile", "interpret"))
def run_fused_grads(x, theta, mask, tparams, masks, cparams, *, plan,
                    tcounts, mask_slots, tile=512, interpret=None,
                    denom=None):
    """Masked-NLL loss and folded-parameter gradients for ONE batch.

    ``mask``: per-row weights (zeros for padded rows; importance weights
    fold in exactly as in ``train.masked_nll_loss``). Returns
    ``(loss, grads)`` with ``grads`` aligned to the folded ``tparams``.
    Jit-traceable, so it composes with ``lax.scan`` epoch loops and with
    ``shard_map``: each device passes its LOCAL shard plus the GLOBAL
    ``denom`` (a ``lax.psum`` of Σmask), so the psummed loss/grads equal
    the single-device values exactly.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = x.shape[0]
    d = x.shape[-1]
    n = theta.shape[-1] if theta is not None else 0
    tile = min(tile, b)
    n_tiles = -(-b // tile)
    pad = n_tiles * tile - b
    offsets, n_t = _offsets(plan, tcounts)
    n_c = sum(3 for op in plan if op[0] == "affine")
    n_m = len(masks)

    if denom is None:
        denom = jnp.sum(mask)
    denom = jnp.maximum(denom, 1e-12).reshape(1, 1)

    def pad_rows(a):
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)
        return a

    xs = pad_rows(jnp.asarray(x, jnp.float32)).reshape(n_tiles, tile, d)
    ths = None
    if n:
        ths = pad_rows(jnp.asarray(theta, jnp.float32)).reshape(
            n_tiles, tile, n)
    ms = pad_rows(jnp.asarray(mask, jnp.float32).reshape(-1, 1)).reshape(
        n_tiles, tile, 1)

    cfg = (n, d, tile, n_tiles, n_t, n_c, n_m)
    kernel = functools.partial(_step_kernel, plan, offsets,
                               tuple(mask_slots), cfg)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda t, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    def tile_spec(a):
        return pl.BlockSpec((1,) + a.shape[1:], lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [tile_spec(xs)]
    args = [xs]
    if n:
        in_specs.append(tile_spec(ths))
        args.append(ths)
    in_specs.append(tile_spec(ms))
    args.append(ms)
    in_specs.append(const_spec((1, 1)))
    args.append(denom)
    for group in (tparams, masks, cparams):
        for p in group:
            in_specs.append(const_spec(p.shape))
            args.append(p)

    out_shape = [jax.ShapeDtypeStruct((1, 1), jnp.float32)]
    out_specs = [const_spec((1, 1))]
    for p in tparams:
        out_shape.append(jax.ShapeDtypeStruct(p.shape, jnp.float32))
        out_specs.append(const_spec(p.shape))

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    return out[0][0, 0], list(out[1:])


def folded_nll(tparams, cparams, x, theta, mask, *, plan, tcounts):
    """Masked NLL on FOLDED params — pure jnp (no kernel), jit-traceable.

    The epoch-bookkeeping eval for programs that keep params folded
    (the mesh fused-step program): same math as train.masked_nll_loss,
    reusing the `_plan_fwd` inverse fold on arrays.
    """
    offsets, n_t = _offsets(plan, tcounts)
    t_refs, c_refs = [], []
    ci = 0
    for op_i, op in enumerate(plan):
        if _op_is_trainable(op):
            o = offsets[op_i]
            cnt = offsets[op_i + 1] - o if op_i + 1 < len(offsets) \
                else n_t - o
            t_refs.append(tuple(tparams[o:o + cnt]))
            c_refs.append(())
        else:
            t_refs.append(())
            c_refs.append(tuple(cparams[ci:ci + 3]))
            ci += 3
    d = x.shape[-1]
    z, ldj, _ = _plan_fwd(plan, t_refs, c_refs, x, theta, False)
    lp = -0.5 * jnp.sum(z * z, axis=-1, keepdims=True) \
        - 0.5 * d * _LOG_2PI + ldj
    m = mask.reshape(-1, 1)
    return -jnp.sum(lp * m) / jnp.maximum(jnp.sum(m), 1e-12)
