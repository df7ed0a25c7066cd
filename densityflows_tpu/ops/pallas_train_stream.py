"""STREAMING fused training kernel: per-batch HBM blocks, any dataset size.

The whole-run kernel (ops/pallas_train.py) keeps the epoch slab AND the
full train/valid eval splits VMEM-resident — which caps it at roughly
10-15k rows. Past that, train() used to fall back to the jnp program and
lose the ~10x launch-overhead win exactly where it matters most (the
reference batchsize-64 loop over 50k-1M-row datasets is thousands of
tiny dispatch sequences per epoch). This kernel removes the residency
requirement for everything O(rows):

    grid over (epochs x n_batches) — ONE batch per grid step
      i == 0: copy params/mu/nu into the resident output blocks
      each step: one (batchsize, d) block DMA'd from the pre-gathered
          HBM slab (double-buffered by Mosaic while the previous batch
          computes) -> inverse fold -> masked NLL -> hand-derived
          backward -> Adam update in place (params/moments stay in VMEM
          across ALL steps)
      last batch of each epoch: snapshot the folded params to an
          (epochs, ...) HBM output block

Per-epoch train/valid NLL histories (the reference bookkeeping,
/root/reference/src/Flows.jl:419-437) are computed OUTSIDE the kernel by
`eval_snapshots`: one jitted program that vmaps the same `_plan_fwd`
inverse fold over the stacked per-epoch snapshots, scanning over row
chunks so the eval memory is O(epochs x chunk), never O(rows). Histories
therefore match the resident kernel's in-kernel evals to float
accumulation order, and the optimization trajectory itself is identical
math to `train.make_train_program` (same shuffle keys, same batch
composition, same Adam algebra) — the parity tests assert it.

The reference loop being fused is /root/reference/src/Flows.jl:396-417;
the Adam/bias-correction algebra matches optax.adam exactly, as in the
resident kernel.
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
    _nll_and_gz,
    _offsets,
    _op_is_trainable,
    _plan_bwd,
    _plan_fwd,
)

__all__ = ["run_fused_train_stream", "stream_vmem_bytes", "eval_snapshots"]


def _stream_kernel(plan, offsets, mask_slots, cfg, *refs):
    """cfg: (n, d, batchsize, n_batches, n_train, count0, lr, b1, b2,
    eps, n_t, n_c, n_m, weighted, guard) — all static."""
    (n, d, bs_rows, n_batches, n_train, count0, lr, b1, b2, eps,
     n_t, n_c, n_m, weighted, guard) = cfg
    i = 0
    xs_ref = refs[i]; i += 1
    ths_ref = None
    if n:
        ths_ref = refs[i]; i += 1
    ws_ref = None
    if weighted:
        ws_ref = refs[i]; i += 1
    p_in = refs[i:i + n_t]; i += n_t
    mu_in = refs[i:i + n_t]; i += n_t
    nu_in = refs[i:i + n_t]; i += n_t
    mask_refs = refs[i:i + n_m]; i += n_m
    c_flat = refs[i:i + n_c]; i += n_c
    p_out = refs[i:i + n_t]; i += n_t
    mu_out = refs[i:i + n_t]; i += n_t
    nu_out = refs[i:i + n_t]; i += n_t
    snap = refs[i:i + n_t]; i += n_t
    hist_s = refs[i] if guard else None

    t_refs, c_refs = [], []
    ci = 0
    for op_i, op in enumerate(plan):
        if _op_is_trainable(op):
            o = offsets[op_i]
            cnt = offsets[op_i + 1] - o if op_i + 1 < len(offsets) \
                else n_t - o
            t_refs.append(p_out[o:o + cnt])
            c_refs.append(())
        else:
            t_refs.append(())
            c_refs.append(c_flat[ci:ci + 3])
            ci += 3

    step = pl.program_id(0)
    b = step % n_batches  # batch index inside the epoch

    @pl.when(step == 0)
    def _init():
        for k in range(n_t):
            p_out[k][:] = p_in[k][:]
            mu_out[k][:] = mu_in[k][:]
            nu_out[k][:] = nu_in[k][:]
        if guard:
            hist_s[:] = jnp.zeros(hist_s.shape, jnp.float32)

    x = xs_ref[0].astype(jnp.float32)  # (bs, d)
    th = ths_ref[0].astype(jnp.float32) if ths_ref is not None else None
    row = jax.lax.broadcasted_iota(jnp.int32, (bs_rows, 1), 0)
    mask = ((b * bs_rows + row) < n_train).astype(jnp.float32)
    if ws_ref is not None:
        mask = mask * ws_ref[0].astype(jnp.float32)

    z, ldj, caches = _plan_fwd(plan, t_refs, c_refs, x, th, True)
    loss, gz, jbar = _nll_and_gz(z, ldj, mask, d)
    grads = _plan_bwd(plan, caches, th, gz, jbar, offsets, n_t)

    if guard:
        ok_f = jnp.where(jnp.isfinite(loss), 1.0, 0.0)
    for k in range(n_t):
        slot = mask_slots[k]
        if slot is not None:
            grads[k] = jnp.where(mask_refs[slot][:] > 0.5, grads[k], 0.0)
        if guard:
            ok_f = jnp.minimum(
                ok_f, jnp.min(jnp.where(jnp.isfinite(grads[k]), 1.0, 0.0)))

    if guard:
        ok = ok_f > 0.5
        # applied updates so far = steps so far − skips so far; the skip
        # history is a resident (epochs, 1) block summed directly (rows
        # past the current epoch are still the zeros from _init)
        applied = step - jnp.sum(hist_s[:]).astype(jnp.int32)
        t = (count0 + applied + 1).astype(jnp.float32)
    else:
        t = (count0 + step + 1).astype(jnp.float32)
    bc1 = 1.0 - jnp.exp(t * np.float32(np.log(b1)))
    bc2 = 1.0 - jnp.exp(t * np.float32(np.log(b2)))
    for k in range(n_t):
        g = grads[k]
        m = b1 * mu_out[k][:] + (1.0 - b1) * g
        v = b2 * nu_out[k][:] + (1.0 - b2) * g * g
        p_new = p_out[k][:] - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
        if guard:
            m = jnp.where(ok, m, mu_out[k][:])
            v = jnp.where(ok, v, nu_out[k][:])
            p_new = jnp.where(ok, p_new, p_out[k][:])
        mu_out[k][:] = m
        nu_out[k][:] = v
        p_out[k][:] = p_new
    if guard:
        e = step // n_batches
        row_h = jax.lax.broadcasted_iota(jnp.int32, hist_s.shape, 0)
        hist_s[:] = hist_s[:] + jnp.where(
            jnp.logical_and(row_h == e, jnp.logical_not(ok)), 1.0, 0.0)

    # end of epoch: snapshot the folded params for the out-of-kernel
    # history evals / best-epoch selection
    @pl.when(b == n_batches - 1)
    def _snap():
        for k in range(n_t):
            snap[k][0] = p_out[k][:]


def stream_vmem_bytes(plan, tparams, cparams, batchsize, d, n,
                      weighted=False, epochs=0, guarded=False) -> int:
    """Resident working set of the streaming kernel: double-buffered
    batch blocks, 7 tile-padded param copies (p/m/v in+out + masks) plus
    ONE snapshot block, one batch's activations, and the (epochs, 1)
    skip history when guarded. NOTHING here scales with the dataset row
    count — that is the point."""
    lane = 128

    def param_bytes(p):
        return max(int(np.prod(p.shape)) * 4, 8 * lane * 4)

    batch_blk = 2 * batchsize * (max(d, lane) + (max(n, lane) if n else 0)
                                 + (lane if weighted else 0)) * 4
    params = 8 * sum(param_bytes(p) for p in tparams)
    consts = sum(param_bytes(p) for p in cparams)
    widest = max([int(p.shape[-1]) for p in tparams if p.ndim == 2] + [d])
    n_hidden = sum(max(op[3], op[4]) for op in plan if op[0] == "coupling")
    acts = (2 + n_hidden) * batchsize * max(widest, lane) * 4
    hist = (-(-max(epochs, 1) // 8) * 8) * lane * 4 if guarded else 0
    return batch_blk + params + consts + acts + hist


@functools.partial(
    jax.jit,
    static_argnames=("plan", "tcounts", "mask_slots", "epochs", "batchsize",
                     "n_train", "count0", "lr", "b1", "b2", "eps",
                     "interpret", "guard"),
)
def _run_stream(xs, ths, ws, tparams, mu, nu, masks, cparams, *, plan,
                tcounts, mask_slots, epochs, batchsize, n_train, count0,
                lr, b1, b2, eps, interpret, guard=False):
    n_batches = xs.shape[0] // epochs
    d = xs.shape[-1]
    n = ths.shape[-1] if ths is not None else 0
    weighted = ws is not None
    offsets, n_t = _offsets(plan, tcounts)
    n_c = sum(3 for op in plan if op[0] == "affine")
    n_m = len(masks)

    cfg = (n, d, batchsize, n_batches, n_train, count0, lr, b1, b2, eps,
           n_t, n_c, n_m, weighted, guard)
    kernel = functools.partial(_stream_kernel, plan, offsets, mask_slots,
                               cfg)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    def batch_spec(a):
        return pl.BlockSpec((1,) + a.shape[1:], lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [batch_spec(xs)]
    args = [xs]
    if n:
        in_specs.append(batch_spec(ths))
        args.append(ths)
    if weighted:
        in_specs.append(batch_spec(ws))
        args.append(ws)
    for group in (tparams, mu, nu, masks, cparams):
        for p in group:
            in_specs.append(const_spec(p.shape))
            args.append(p)

    out_shape, out_specs = [], []
    for group in (tparams, mu, nu):
        for p in group:
            out_shape.append(jax.ShapeDtypeStruct(p.shape, jnp.float32))
            out_specs.append(const_spec(p.shape))
    for p in tparams:  # per-epoch snapshots
        out_shape.append(
            jax.ShapeDtypeStruct((epochs,) + p.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(
            (1,) + p.shape,
            lambda i, _nb=n_batches, _nd=p.ndim: (i // _nb,) + (0,) * _nd,
            memory_space=pltpu.VMEM))
    if guard:
        out_shape.append(jax.ShapeDtypeStruct((epochs, 1), jnp.float32))
        out_specs.append(const_spec((epochs, 1)))

    out = pl.pallas_call(
        kernel,
        grid=(epochs * n_batches,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    p_new = out[:n_t]
    mu_new = out[n_t:2 * n_t]
    nu_new = out[2 * n_t:3 * n_t]
    snaps = out[3 * n_t:4 * n_t]
    skips = out[-1][:, 0] if guard else None
    return p_new, mu_new, nu_new, snaps, skips


def run_fused_train_stream(
    plan, tcounts, tparams, masks, mask_slots, cparams, mu, nu,
    x, theta, key,
    *, epochs, batchsize, shuffle=True, n_train=None, count0=0,
    lr=1e-3, b1=0.9, b2=0.999, eps=1e-8, interpret=None,
    w=None, guard_nonfinite=False, epoch_keys=None,
):
    """Run ``epochs`` of training as one streaming kernel.

    Same shuffle/batching contract as ``run_fused_train`` (per-epoch
    ``jax.random.permutation`` keys, final partial batch padded with row
    0 and masked). Returns ``(params, mu, nu, snaps, skips)`` where
    ``snaps`` is the list of per-epoch folded parameter snapshots
    (each ``(epochs,) + param.shape``) — feed them to
    :func:`eval_snapshots` for the NLL histories.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = x.shape[0] if n_train is None else n_train
    n_cond = theta.shape[-1] if theta is not None else 0
    n_batches = -(-n // batchsize)
    n_pad = n_batches * batchsize

    keys = jax.random.split(key, epochs) if epoch_keys is None else epoch_keys
    if shuffle:
        perms = jax.vmap(
            lambda k: jax.random.permutation(k, n).astype(jnp.int32)
        )(keys)
    else:
        perms = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (1, n), 1), (epochs, n))
    idx = jnp.zeros((epochs, n_pad), jnp.int32).at[:, :n].set(perms)
    idx = idx.reshape(epochs * n_batches, batchsize)
    xs = jnp.asarray(x, jnp.float32)[idx]
    ths = jnp.asarray(theta, jnp.float32)[idx] if n_cond else None
    ws = None
    if w is not None:
        ws = jnp.asarray(w, jnp.float32).reshape(-1, 1)[idx]

    return _run_stream(
        xs, ths, ws, tuple(tparams), tuple(mu), tuple(nu), tuple(masks),
        tuple(cparams), plan=plan, tcounts=tuple(tcounts),
        mask_slots=tuple(mask_slots), epochs=epochs, batchsize=batchsize,
        n_train=n, count0=count0, lr=float(lr), b1=float(b1),
        b2=float(b2), eps=float(eps), interpret=interpret,
        guard=guard_nonfinite,
    )


@functools.partial(
    jax.jit, static_argnames=("plan", "tcounts", "row_chunk"))
def eval_snapshots(snaps, cparams, x, theta, w, *, plan, tcounts,
                   row_chunk=4096):
    """Per-epoch full-split NLLs for every snapshot in one program.

    ``snaps``: per-param ``(E,) + shape`` stacked folded snapshots.
    Scans over row chunks of ``x`` (padded rows masked), vmapping the
    ``_plan_fwd`` inverse fold over the epoch axis inside each chunk —
    eval memory is O(E x row_chunk x width) regardless of the dataset
    size. With ``w``, the weighted NLL −Σw·lp/Σw (train.masked_nll_loss
    weighted semantics). Returns an (E,) NLL vector.
    """
    offsets, n_t = _offsets(plan, tcounts)
    n_rows = x.shape[0]
    d = x.shape[-1]
    n_chunks = -(-n_rows // row_chunk)
    pad = n_chunks * row_chunk - n_rows

    def pad_rows(a):
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)
        return a

    xp = pad_rows(jnp.asarray(x, jnp.float32)).reshape(
        n_chunks, row_chunk, d)
    thp = None
    if theta is not None and theta.shape[-1]:
        thp = pad_rows(jnp.asarray(theta, jnp.float32)).reshape(
            n_chunks, row_chunk, -1)
    mask_base = (jax.lax.broadcasted_iota(
        jnp.int32, (n_chunks * row_chunk, 1), 0) < n_rows).astype(
            jnp.float32)
    if w is not None:
        mask_base = mask_base * pad_rows(
            jnp.asarray(w, jnp.float32).reshape(-1, 1))
    maskp = mask_base.reshape(n_chunks, row_chunk, 1)

    def one_epoch(tp_list, xc, thc, mc):
        t_refs, c_refs = [], []
        ci = 0
        for op_i, op in enumerate(plan):
            if _op_is_trainable(op):
                o = offsets[op_i]
                cnt = offsets[op_i + 1] - o if op_i + 1 < len(offsets) \
                    else n_t - o
                t_refs.append(tp_list[o:o + cnt])
                c_refs.append(())
            else:
                t_refs.append(())
                c_refs.append(tuple(cparams[ci:ci + 3]))
                ci += 3
        z, ldj, _ = _plan_fwd(plan, t_refs, c_refs, xc, thc, False)
        lp = -0.5 * jnp.sum(z * z, axis=-1, keepdims=True) \
            - 0.5 * d * _LOG_2PI + ldj
        return jnp.sum(lp * mc), jnp.sum(mc)

    vmapped = jax.vmap(one_epoch,
                       in_axes=(0, None, None, None))

    def chunk_body(carry, inp):
        s_lp, s_m = carry
        xc, thc, mc = inp
        lp_e, m_e = vmapped(list(snaps), xc, thc, mc)
        return (s_lp + lp_e, s_m + m_e), None

    e_count = snaps[0].shape[0]
    init = (jnp.zeros((e_count,), jnp.float32),
            jnp.zeros((e_count,), jnp.float32))
    if thp is None:
        thp = jnp.zeros((n_chunks, row_chunk, 0), jnp.float32)
    (s_lp, s_m), _ = jax.lax.scan(chunk_body, init, (xp, thp, maskp))
    return -s_lp / jnp.maximum(s_m, 1e-12)
