"""Whole-RUN fused Pallas training kernel: every epoch in ONE kernel.

The reference training loop (/root/reference/src/Flows.jl:380-445) at its
own README config (5-D, hidden-16 conditioners, batch 64) is pure launch
overhead on a TPU: a fused-XLA train step is ~37 µs of which the actual
FLOPs are ~10 ns — the step is a *sequence* of tiny kernels (18 forward
matmuls + ~36 backward + Adam), each individually far below launch cost,
and `train.make_train_program`'s scan pays that sequence 8-15× per epoch.

This module removes the sequence entirely: ONE `pallas_call` runs the
whole multi-epoch training loop with the parameters, Adam moments, and
evaluation sets resident in VMEM for the entire run —

    grid over epochs (sequential)
      e == 0: copy params/mu/nu from inputs into the output blocks
              (constant index_map ⇒ the blocks stay VMEM-resident)
      fori over batches: inverse fold w/ activation caches → masked NLL
          → hand-derived backward (the rrule algebra of
          /root/reference/src/affine/RNVP.jl:99-147 on folded weights)
          → masked-gradient Adam update in place
      full-split train/valid NLL evals → per-epoch history outputs

Batches are pre-gathered OUTSIDE the kernel into an (epochs, n_batches,
batch, d) slab using the exact shuffle of the jnp program
(`jax.random.permutation` per epoch key), so batch composition — and
therefore the optimization trajectory — matches `train()` bit-for-bit up
to float accumulation order. Each grid step DMAs one epoch's slab
(~0.5 MB at the reference config) while the previous epoch computes.

Parameters are the *folded* layout of ops/pallas_chain.py (first dense
layer pre-split into θ/x blocks with zero rows off the identity dims;
final layer scattered to d-wide columns), so the kernel does zero
gather/select work. Training on folded parameters is exactly training on
the originals because the fold is a fixed zero-padding embedding: the
off-support entries start at 0 and their gradients are zeroed by static
0/1 masks *before* the Adam moments, so m = v = update = 0 there forever,
while on-support entries see identical gradients (the embedding is the
identity on them). Adam itself reproduces `optax.adam` exactly
(scale_by_adam with bias correction, eps_root=0, then scale(-lr)).

Supported ops: "coupling" (nvp / nice / joint) with value-differentiable
activations (relu, tanh, sigmoid, identity), "anorm" (TRAINABLE Glow
ActNorm — two (1, d) params with their own value-based backward), and
"affine" (Normalization — non-trainable constants). Permutations fold
away at the builder level (coordinate-map composition). The builder
(models/fused_train.py) rejects everything else.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["run_fused_train", "train_vmem_bytes"]

_LOG_2PI = float(np.log(2.0 * np.pi))

# VMEM ceiling for the feasibility estimate (v5e ~16 MB/core; leave room
# for Mosaic's double-buffering of the per-epoch slab). 12 MB: the 4010
# epoch crossover run (est. 10.2 MB once the estimator counted the
# lane-padded history blocks) is hardware-PROVEN, and the measured
# Mosaic compile-failure zone starts at ~28 MB estimates (design.md
# §12b); auto mode catches an estimator miss at runtime and falls back.
_VMEM_BUDGET = 12 * 1024 * 1024


def _act(name, u):
    if name == "identity":
        return u
    if name == "relu":
        return jnp.maximum(u, 0.0)
    if name == "tanh":
        return jnp.tanh(u)
    if name == "sigmoid":
        return jax.nn.sigmoid(u)
    raise ValueError(f"unsupported activation for fused train: {name}")


def _dact_from_value(name, a, delta):
    """delta · σ'(u) computed from the activation VALUE a = σ(u) — the
    reason the supported-activation set is {relu, tanh, sigmoid,
    identity} (their derivatives are functions of the value)."""
    if name == "identity":
        return delta
    if name == "relu":
        return delta * (a > 0.0).astype(delta.dtype)
    if name == "tanh":
        return delta * (1.0 - a * a)
    if name == "sigmoid":
        return delta * (a * (1.0 - a))
    raise ValueError(name)


def _bt(a, delta):
    """aᵀ @ delta contracting the batch axis: (B, I), (B, O) → (I, O)."""
    return jax.lax.dot_general(
        a, delta, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _mm(a, w):
    return jnp.dot(a, w, preferred_element_type=jnp.float32)


def _mm_t(delta, w):
    """delta @ wᵀ: (B, O), (I, O) → (B, I)."""
    return jax.lax.dot_general(
        delta, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# per-op forward (with caches) and backward on folded params


def _split_net_layout(op):
    """(n_weight_blocks, n_dense_layers, has_bias) per net of a split op."""
    (_, kind, _, n_s, n_t, act_s, act_t, bias_s, bias_t, has_th, has_id,
     _clamp) = op
    fb = (1 if has_th else 0) + (1 if has_id else 0)
    return fb


def _mlp_fwd(x, th, ws, bs, act, L, has_th, has_id):
    """Folded-conditioner forward; returns (out, acts) where acts are the
    L-1 post-activation hidden values needed by the backward."""
    i = 0
    u = None
    if has_th:
        u = _mm(th, ws[0])
        i = 1
    if has_id:
        ux = _mm(x, ws[i])
        u = ux if u is None else u + ux
        i += 1
    if bs is not None:
        u = u + bs[0]
    a = _act(act, u)
    acts = [a]
    out = None
    for layer in range(1, L):
        u = _mm(a, ws[i])
        i += 1
        if bs is not None:
            u = u + bs[layer]
        if layer < L - 1:
            a = _act(act, u)
            acts.append(a)
        else:
            out = u
    return out, acts


def _mlp_bwd(delta_out, x, th, acts, ws, act, L, has_th, has_id, has_bias):
    """Backward of `_mlp_fwd`: returns (wgrads, bgrads, xbar) with grads
    in fold order ([dW1θ?, dW1x?, dW2.., dW_L], [db1.., db_L])."""
    fb = (1 if has_th else 0) + (1 if has_id else 0)
    wgrads = [None] * (fb + L - 1)
    bgrads = [None] * L if has_bias else []
    delta = delta_out
    for layer in range(L, 1, -1):
        w_idx = fb + layer - 2
        a_prev = acts[layer - 2]
        wgrads[w_idx] = _bt(a_prev, delta)
        if has_bias:
            bgrads[layer - 1] = jnp.sum(delta, axis=0, keepdims=True)
        delta = _mm_t(delta, ws[w_idx])
        delta = _dact_from_value(act, a_prev, delta)
    # first layer (delta is now ∂L/∂u₁)
    i = 0
    if has_th:
        wgrads[0] = _bt(th, delta)
        i = 1
    xbar = None
    if has_id:
        wgrads[i] = _bt(x, delta)
        xbar = _mm_t(delta, ws[i])
    if has_bias:
        bgrads[0] = jnp.sum(delta, axis=0, keepdims=True)
    return wgrads, bgrads, xbar


def _clamp_s(s_full, clamp):
    """Glow-style tanh soft-clamp of the log-scale (layers.py
    ``max_log_scale``): s_c = M·tanh(s/M). The folded s is exactly zero
    on identity dims and tanh(0) = 0, so the clamp preserves the folded
    zero pattern. Returns (s_c, dŝ/ds = 1 − (s_c/M)²) — the derivative
    is a function of the clamped VALUE, so the backward needs no extra
    cache beyond it."""
    if not clamp:
        return s_full, None
    s_c = clamp * jnp.tanh(s_full / clamp)
    return s_c, 1.0 - (s_c / clamp) ** 2


def _coupling_fwd(op, prefs, x, th, ldj, want_cache):
    """Inverse-direction coupling (the training direction,
    RNVP.jl:77-96): z = (x − t)·exp(−s), ldj −= Σs. s/t are d-wide and
    exactly zero on identity dims (folded scatter), so the full-width
    transform IS the coupling."""
    (_, kind, _, n_s, n_t, act_s, act_t, bias_s, bias_t,
     has_th, has_id, clamp) = op
    fb = (1 if has_th else 0) + (1 if has_id else 0)
    if kind == "packed":
        # s/t pair as ONE MLP (concat first layer, block-diag hiddens,
        # (2H, 2d) final) — same padded-tile cost per matmul as one of
        # the two nets it replaces (models/fused_train._packed_fold)
        L = n_s
        d = x.shape[-1]
        ws = [r[:] for r in prefs[:L]]
        bs = [r[:] for r in prefs[L:]] if bias_s else None
        inp = jnp.concatenate([th, x], axis=-1) if has_th else x
        u = _mm(inp, ws[0])
        if bs is not None:
            u = u + bs[0]
        a = _act(act_s, u)
        acts = [a]
        for layer in range(1, L - 1):
            u = _mm(a, ws[layer])
            if bs is not None:
                u = u + bs[layer]
            a = _act(act_s, u)
            acts.append(a)
        out = _mm(a, ws[L - 1])
        if bs is not None:
            out = out + bs[L - 1]
        s_full, dcl = _clamp_s(out[:, :d], clamp)
        t_full = out[:, d:]
        e = jnp.exp(-s_full)
        z = (x - t_full) * e
        ldj = ldj - jnp.sum(s_full, axis=-1, keepdims=True)
        cache = (x, inp, ws, acts, t_full, e, dcl) if want_cache else None
        return z, ldj, cache
    if kind == "joint":
        L = n_s
        n_w = fb + (L - 2) + 2
        ws = [r[:] for r in prefs[:n_w]]
        bs = [r[:] for r in prefs[n_w:]] if bias_s else None
        # shared stack: L-1 dense layers, all activated
        i = 0
        u = None
        if has_th:
            u = _mm(th, ws[0])
            i = 1
        if has_id:
            ux = _mm(x, ws[i])
            u = ux if u is None else u + ux
            i += 1
        if bs is not None:
            u = u + bs[0]
        a = _act(act_s, u)
        acts = [a]
        for layer in range(1, L - 1):
            u = _mm(a, ws[i])
            i += 1
            if bs is not None:
                u = u + bs[layer]
            a = _act(act_s, u)
            acts.append(a)
        s_full = _mm(a, ws[i])
        t_full = _mm(a, ws[i + 1])
        if bs is not None:
            s_full = s_full + bs[L - 1]
            t_full = t_full + bs[L]
        s_full, dcl = _clamp_s(s_full, clamp)
        e = jnp.exp(-s_full)
        z = (x - t_full) * e
        ldj = ldj - jnp.sum(s_full, axis=-1, keepdims=True)
        cache = (x, ws, acts, t_full, e, dcl) if want_cache else None
        return z, ldj, cache

    if kind == "nvp":
        nw_s = fb + (n_s - 1)
        k = nw_s + (n_s if bias_s else 0)
        ws_s = [r[:] for r in prefs[:nw_s]]
        bs_s = ([r[:] for r in prefs[nw_s:k]] if bias_s else None)
        prefs_t = prefs[k:]
    else:  # nice
        ws_s = bs_s = None
        prefs_t = prefs
    nw_t = fb + (n_t - 1)
    ws_t = [r[:] for r in prefs_t[:nw_t]]
    bs_t = ([r[:] for r in prefs_t[nw_t:nw_t + n_t]] if bias_t else None)

    if kind == "nvp":
        s_full, acts_s = _mlp_fwd(x, th, ws_s, bs_s, act_s, n_s,
                                  has_th, has_id)
    t_full, acts_t = _mlp_fwd(x, th, ws_t, bs_t, act_t, n_t,
                              has_th, has_id)

    if kind == "nvp":
        s_full, dcl = _clamp_s(s_full, clamp)
        e = jnp.exp(-s_full)
        z = (x - t_full) * e
        ldj = ldj - jnp.sum(s_full, axis=-1, keepdims=True)
        cache = ((x, ws_s, acts_s, ws_t, acts_t, t_full, e, dcl)
                 if want_cache else None)
    else:  # NICE: volume preserving (NICE.jl:63-81)
        z = x - t_full
        cache = (x, ws_t, acts_t) if want_cache else None
    return z, ldj, cache


def _coupling_bwd(op, cache, th, gz, jbar):
    """Cotangents of the inverse coupling — the hand-written rrule algebra
    of RNVP.jl:99-147 (note the −j̄ coupling of the ldj cotangent into
    s̄) re-derived for the folded d-wide layout. Returns (gx, grads) with
    grads aligned to the op's folded trainable params."""
    (_, kind, _, n_s, n_t, act_s, act_t, bias_s, bias_t,
     has_th, has_id, _clamp) = op
    if kind == "packed":
        x, inp, ws, acts, t_full, e, dcl = cache
        L = n_s
        n = inp.shape[-1] - x.shape[-1]
        z_val = (x - t_full) * e
        sbar = -gz * z_val - jbar
        if dcl is not None:
            sbar = sbar * dcl  # through the tanh clamp
        tbar = -gz * e
        delta = jnp.concatenate([sbar, tbar], axis=-1)  # (B, 2d)
        wgrads = [None] * L
        bgrads = [None] * L if bias_s else []
        for layer in range(L - 1, 0, -1):
            a_prev = acts[layer - 1]
            wgrads[layer] = _bt(a_prev, delta)
            if bias_s:
                bgrads[layer] = jnp.sum(delta, axis=0, keepdims=True)
            delta = _mm_t(delta, ws[layer])
            delta = _dact_from_value(act_s, a_prev, delta)
        wgrads[0] = _bt(inp, delta)
        if bias_s:
            bgrads[0] = jnp.sum(delta, axis=0, keepdims=True)
        inp_bar = _mm_t(delta, ws[0])
        xbar_c = inp_bar[:, n:] if n else inp_bar
        gx = gz * e + xbar_c
        return gx, wgrads + bgrads
    if kind == "joint":
        x, ws, acts, t_full, e, dcl = cache
        L = n_s
        fb = (1 if has_th else 0) + (1 if has_id else 0)
        z_val = (x - t_full) * e
        sbar = -gz * z_val - jbar
        if dcl is not None:
            sbar = sbar * dcl  # through the tanh clamp
        tbar = -gz * e
        a_top = acts[-1]
        wg_s_head = _bt(a_top, sbar)
        wg_t_head = _bt(a_top, tbar)
        i_head = fb + (L - 2)
        delta = _mm_t(sbar, ws[i_head]) + _mm_t(tbar, ws[i_head + 1])
        wgrads = [None] * (fb + L - 2) + [wg_s_head, wg_t_head]
        bgrads = ([None] * (L - 1) + [jnp.sum(sbar, 0, keepdims=True),
                                      jnp.sum(tbar, 0, keepdims=True)]
                  if bias_s else [])
        # shared stack backward: layers L-1 .. 2
        delta = _dact_from_value(act_s, a_top, delta)
        for layer in range(L - 1, 1, -1):
            w_idx = fb + layer - 2
            a_prev = acts[layer - 2]
            wgrads[w_idx] = _bt(a_prev, delta)
            if bias_s:
                bgrads[layer - 1] = jnp.sum(delta, 0, keepdims=True)
            delta = _mm_t(delta, ws[w_idx])
            delta = _dact_from_value(act_s, a_prev, delta)
        i = 0
        if has_th:
            wgrads[0] = _bt(th, delta)
            i = 1
        xbar_c = None
        if has_id:
            wgrads[i] = _bt(x, delta)
            xbar_c = _mm_t(delta, ws[i])
        if bias_s:
            bgrads[0] = jnp.sum(delta, 0, keepdims=True)
        gx = gz * e
        if xbar_c is not None:
            gx = gx + xbar_c
        return gx, wgrads + bgrads

    if kind == "nvp":
        x, ws_s, acts_s, ws_t, acts_t, t_full, e, dcl = cache
        z_val = (x - t_full) * e
        sbar = -gz * z_val - jbar
        if dcl is not None:
            sbar = sbar * dcl  # through the tanh clamp
        tbar = -gz * e
        wg_s, bg_s, xb_s = _mlp_bwd(sbar, x, th, acts_s, ws_s, act_s,
                                    n_s, has_th, has_id, bias_s)
        wg_t, bg_t, xb_t = _mlp_bwd(tbar, x, th, acts_t, ws_t, act_t,
                                    n_t, has_th, has_id, bias_t)
        gx = gz * e
        if xb_s is not None:
            gx = gx + xb_s
        if xb_t is not None:
            gx = gx + xb_t
        return gx, wg_s + bg_s + wg_t + bg_t

    # nice
    x, ws_t, acts_t = cache
    tbar = -gz
    wg_t, bg_t, xb_t = _mlp_bwd(tbar, x, th, acts_t, ws_t, act_t,
                                n_t, has_th, has_id, bias_t)
    gx = gz if xb_t is None else gz + xb_t
    return gx, wg_t + bg_t


# ---------------------------------------------------------------------------
# plan-level forward / loss / backward


def _op_is_trainable(op) -> bool:
    return op[0] in ("coupling", "anorm")


def _plan_fwd(plan, t_refs, c_refs, x, th, want_cache):
    ldj = jnp.zeros((x.shape[0], 1), jnp.float32)
    caches = []
    for op, tp, cp in zip(plan, t_refs, c_refs):
        if op[0] == "coupling":
            x, ldj, cache = _coupling_fwd(op, tp, x, th, ldj, want_cache)
            caches.append(cache)
        elif op[0] == "anorm":
            # TRAINABLE per-dim affine (Glow ActNorm, glow.py:43-74),
            # inverse direction: z = (x − b)·eˢ, ldj += Σs
            s = tp[0][:]
            e = jnp.exp(s)
            x = (x - tp[1][:]) * e
            ldj = ldj + jnp.sum(s)
            caches.append((x, e) if want_cache else None)
        elif op[0] == "affine":
            a = cp[0][:]
            x = x * a + cp[1][:]
            ldj = ldj + cp[2][:]
            caches.append((a,) if want_cache else None)
        else:  # pragma: no cover - builder rejects
            raise ValueError(f"fused train does not support op {op[0]!r}")
    return x, ldj, caches


def _nll_and_gz(z, ldj, mask, d):
    """Masked NLL (train.masked_nll_loss semantics) and its cotangents:
    loss = −Σ mᵢ·lpᵢ / Σm; returns (loss, gz = ∂L/∂z, jbar = ∂L/∂lp)."""
    lp = -0.5 * jnp.sum(z * z, axis=-1, keepdims=True) \
        - 0.5 * d * _LOG_2PI + ldj
    denom = jnp.maximum(jnp.sum(mask), 1e-12)
    loss = -jnp.sum(lp * mask) / denom
    jbar = -mask / denom
    gz = -jbar * z
    return loss, gz, jbar


def _plan_bwd(plan, caches, th, gz, jbar, offsets, n_tparams):
    """Reverse sweep over the plan; returns the flat trainable-grad list
    (aligned with the folded trainable params)."""
    grads = [None] * n_tparams
    for i in range(len(plan) - 1, -1, -1):
        op = plan[i]
        if op[0] == "coupling":
            gz, op_grads = _coupling_bwd(op, caches[i], th, gz, jbar)
            o = offsets[i]
            for k, g in enumerate(op_grads):
                grads[o + k] = g
        elif op[0] == "anorm":
            # z = (x − b)·eˢ ⇒ ∂z/∂s = z, ∂z/∂b = −eˢ; the ldj term Σⱼsⱼ
            # couples jbar into every sⱼ
            z_val, e = caches[i]
            o = offsets[i]
            grads[o] = jnp.sum(gz * z_val, axis=0, keepdims=True) \
                + jnp.sum(jbar)
            grads[o + 1] = -jnp.sum(gz, axis=0, keepdims=True) * e
            gz = gz * e
        elif op[0] == "affine":
            gz = gz * caches[i][0]
    return grads


# ---------------------------------------------------------------------------
# the kernel


def _eval_nll_both(plan, t_refs, c_refs, x_ref, th_ref, wev_ref, n_ev_t,
                   ev_off, n_ev_v, d):
    """One inverse pass over the CONCATENATED train+valid eval rows
    (train rows [0, n_ev_t), valid rows [ev_off, ev_off + n_ev_v)),
    then two masked means — halves the per-epoch eval matmuls. With
    ``wev_ref`` (per-row importance weights), both means become the
    weighted NLL −Σw·lp/Σw (train.masked_nll_loss weighted semantics)."""
    x = x_ref[:].astype(jnp.float32)
    th = th_ref[:].astype(jnp.float32) if th_ref is not None else None
    z, ldj, _ = _plan_fwd(plan, t_refs, c_refs, x, th, False)
    lp = -0.5 * jnp.sum(z * z, axis=-1, keepdims=True) \
        - 0.5 * d * _LOG_2PI + ldj
    row = jax.lax.broadcasted_iota(jnp.int32, lp.shape, 0)
    mt = (row < n_ev_t).astype(jnp.float32)
    mv = jnp.logical_and(row >= ev_off,
                         row < ev_off + n_ev_v).astype(jnp.float32)
    if wev_ref is not None:
        w = wev_ref[:].astype(jnp.float32)
        mt = mt * w
        mv = mv * w
        tl = -jnp.sum(lp * mt) / jnp.maximum(jnp.sum(mt), 1e-12)
        vl = -jnp.sum(lp * mv) / jnp.maximum(jnp.sum(mv), 1e-12)
    else:
        tl = -jnp.sum(lp * mt) / np.float32(n_ev_t)
        vl = -jnp.sum(lp * mv) / np.float32(n_ev_v)
    return tl, vl


def _train_kernel(
    plan, offsets, mask_slots, cfg, *refs,
):
    """cfg: (n, d, batchsize, n_batches, n_train, n_ev_t, ev_off, n_ev_v,
    count0, lr, b1, b2, eps, n_t, n_c, n_m, track_best, weighted, guard) —
    all static."""
    (n, d, bs_rows, n_batches, n_train, n_ev_t, ev_off, n_ev_v,
     count0, lr, b1, b2, eps, n_t, n_c, n_m, track_best, weighted,
     guard) = cfg
    i = 0
    xs_ref = refs[i]; i += 1
    ths_ref = None
    if n:
        ths_ref = refs[i]; i += 1
    ws_ref = None
    if weighted:
        ws_ref = refs[i]; i += 1
    xev = refs[i]; i += 1
    thev = None
    if n:
        thev = refs[i]; i += 1
    wev = None
    if weighted:
        wev = refs[i]; i += 1
    p_in = refs[i:i + n_t]; i += n_t
    mu_in = refs[i:i + n_t]; i += n_t
    nu_in = refs[i:i + n_t]; i += n_t
    mask_refs = refs[i:i + n_m]; i += n_m
    c_flat = refs[i:i + n_c]; i += n_c
    p_out = refs[i:i + n_t]; i += n_t
    mu_out = refs[i:i + n_t]; i += n_t
    nu_out = refs[i:i + n_t]; i += n_t
    hist_t = refs[i]; i += 1
    hist_v = refs[i]; i += 1
    bp_out = None
    if track_best:
        bp_out = refs[i:i + n_t]; i += n_t
    hist_s = refs[i] if guard else None

    # split per-op ref groups (trainable ops consume from the flat
    # trainable list at their offset; affine ops consume from c_flat)
    t_refs, c_refs = [], []
    ci = 0
    for op_i, op in enumerate(plan):
        if _op_is_trainable(op):
            o = offsets[op_i]
            cnt = offsets[op_i + 1] - o if op_i + 1 < len(offsets) else n_t - o
            t_refs.append(p_out[o:o + cnt])
            c_refs.append(())
        else:
            t_refs.append(())
            c_refs.append(c_flat[ci:ci + 3])
            ci += 3

    e = pl.program_id(0)

    @pl.when(e == 0)
    def _init():
        for k in range(n_t):
            p_out[k][:] = p_in[k][:]
            mu_out[k][:] = mu_in[k][:]
            nu_out[k][:] = nu_in[k][:]

    # with the non-finite guard, optax's count only advances on APPLIED
    # updates (train.py keeps the old opt_state on a skip) — the number
    # applied in epochs < e is recovered from the VMEM-resident skip
    # history, so no extra carried state is needed across grid steps
    if guard:
        row_h = jax.lax.broadcasted_iota(jnp.int32, hist_t.shape, 0)
        prev_skips = jnp.sum(jnp.where(row_h < e, hist_s[:], 0.0))
        applied0 = e * n_batches - prev_skips.astype(jnp.int32)

    def batch_body(b, carry):
        # dynamic REF index on the untiled leading dims (a value-level
        # dynamic_slice does not lower inside the fori body)
        x = xs_ref[0, b].astype(jnp.float32)  # (bs, d)
        th = None
        if ths_ref is not None:
            th = ths_ref[0, b].astype(jnp.float32)
        # positional pad mask: global row p = b·bs + r valid iff p < n_train
        row = jax.lax.broadcasted_iota(jnp.int32, (bs_rows, 1), 0)
        mask = ((b * bs_rows + row) < n_train).astype(jnp.float32)
        if ws_ref is not None:
            # importance weights gathered with the same shuffle: the
            # weighted batch loss is −Σ m·w·lp / Σ m·w (train.py
            # weighted=True semantics) — _nll_and_gz normalizes by
            # Σmask, so folding w into the mask IS the weighted loss
            mask = mask * ws_ref[0, b].astype(jnp.float32)

        z, ldj, caches = _plan_fwd(plan, t_refs, c_refs, x, th, True)
        loss, gz, jbar = _nll_and_gz(z, ldj, mask, d)
        # padded rows: mask is already inside gz/jbar, so their gradient
        # contribution is exactly zero (train.py gathers row 0 for them)
        grads = _plan_bwd(plan, caches, th, gz, jbar, offsets, n_t)

        # masked grads == the unfolded jnp gradient leaves scattered, so
        # checking them after masking matches train._all_finite exactly
        # (off-support folded entries never enter the jnp pytree). The
        # mask is a SELECT, not a multiply: an off-support grad that
        # overflowed to ±inf would turn inf·0 into NaN, poisoning the
        # folded zero pattern (and, guarded, tripping a skip the jnp
        # program doesn't take).
        if guard:
            ok_f = jnp.where(jnp.isfinite(loss), 1.0, 0.0)
        for k in range(n_t):
            slot = mask_slots[k]
            if slot is not None:
                grads[k] = jnp.where(mask_refs[slot][:] > 0.5,
                                     grads[k], 0.0)
            if guard:
                ok_f = jnp.minimum(
                    ok_f,
                    jnp.min(jnp.where(jnp.isfinite(grads[k]), 1.0, 0.0)))

        # optax.adam: m,v moments + bias correction + scale(-lr)
        if guard:
            skips, applied = carry
            ok = ok_f > 0.5
            t = (applied + 1).astype(jnp.float32)
        else:
            t = (count0 + e * n_batches + b + 1).astype(jnp.float32)
        bc1 = 1.0 - jnp.exp(t * np.float32(np.log(b1)))
        bc2 = 1.0 - jnp.exp(t * np.float32(np.log(b2)))
        for k in range(n_t):
            g = grads[k]
            m = b1 * mu_out[k][:] + (1.0 - b1) * g
            v = b2 * nu_out[k][:] + (1.0 - b2) * g * g
            p_new = p_out[k][:] - lr * (m / bc1) / (
                jnp.sqrt(v / bc2) + eps)
            if guard:
                # non-finite step: params/moments stay untouched
                m = jnp.where(ok, m, mu_out[k][:])
                v = jnp.where(ok, v, nu_out[k][:])
                p_new = jnp.where(ok, p_new, p_out[k][:])
            mu_out[k][:] = m
            nu_out[k][:] = v
            p_out[k][:] = p_new
        if guard:
            return (skips + 1 - ok.astype(jnp.int32),
                    applied + ok.astype(jnp.int32))
        return 0

    if guard:
        epoch_skips, _ = jax.lax.fori_loop(
            0, n_batches, batch_body, (jnp.int32(0), count0 + applied0))
    else:
        jax.lax.fori_loop(0, n_batches, batch_body, 0)

    # per-epoch full-split evals (reference bookkeeping, Flows.jl:419-437).
    # Histories stay VMEM-resident as (epochs, 1) blocks — a (1, 1) block
    # per grid step fails the TPU (8, 128) tiling rule, so each epoch's
    # row is placed with a masked where instead.
    tl, vl = _eval_nll_both(plan, t_refs, c_refs, xev, thev, wev,
                            n_ev_t, ev_off, n_ev_v, d)
    row = jax.lax.broadcasted_iota(jnp.int32, hist_t.shape, 0)
    if track_best:
        # best-so-far valid NLL = masked min over the VMEM-resident
        # history rows < e (rows ≥ e are zeros/garbage); at e == 0 the
        # min is +inf so `better` is True and bp_out gets its first
        # write — no separate best_vl state needed
        prev_best = jnp.min(jnp.where(row < e, hist_v[:], jnp.inf))
        # e == 0 writes unconditionally: with a NaN valid NLL the `<`
        # comparison is false at every epoch and bp_out would otherwise
        # return uninitialized VMEM (NaN histories are the skip_nonfinite
        # regime — epoch-0 params are the defined fallback)
        better = jnp.logical_or(vl < prev_best, e == 0)
        for k in range(n_t):
            bp_out[k][:] = jnp.where(better, p_out[k][:], bp_out[k][:])
    rows = [(hist_t, tl), (hist_v, vl)]
    if guard:
        # f32 like the NLL histories (exact for any real skip count);
        # epochs < e read it back to recover the applied-update count
        rows.append((hist_s, epoch_skips.astype(jnp.float32)))
    for ref, val in rows:
        prev = jnp.where(e == 0, jnp.zeros(ref.shape, jnp.float32), ref[:])
        ref[:] = jnp.where(row == e, val, prev)


# ---------------------------------------------------------------------------
# host-side runner


def _offsets(plan, tcounts):
    offs, o = [], 0
    for op, c in zip(plan, tcounts):
        offs.append(o)
        o += c
    return tuple(offs), o


def train_vmem_bytes(plan, tparams, cparams, n_batches, batchsize, d, n,
                     n_ev_t, n_ev_v, weighted=False, epochs=0,
                     track_best=False, guarded=False) -> int:
    """Rough resident working set: the per-epoch slab (double-buffered,
    lane-padded), eval sets, 7 tile-padded copies of the params (p/m/v
    in+out + masks), one op's live activations at the largest row
    count (Mosaic reuses activation buffers across the plan fold), the
    (epochs, 1) history blocks lane-padded to 128 (2 NLL rows, +1 when
    ``guarded``), and one more param copy when ``track_best`` (the
    best-epoch outputs)."""
    lane = 128
    tile = 8 * lane * 4  # min f32 tile

    def padded(r, c):
        return r * max(c, lane) * 4

    def param_bytes(p):
        return max(int(np.prod(p.shape)) * 4, tile)

    slab = n_batches * batchsize * (max(d, lane) + (max(n, lane) if n else 0)
                                    + (lane if weighted else 0)) * 4
    evals = (padded(n_ev_t, d) + padded(n_ev_v, d)
             + (padded(n_ev_t, n) + padded(n_ev_v, n) if n else 0)
             + (padded(n_ev_t, 1) + padded(n_ev_v, 1) if weighted else 0))
    # p/m/v in+out + masks + (track_best) best-params outputs
    params = 8 * sum(param_bytes(p) for p in tparams)
    consts = sum(param_bytes(p) for p in cparams)
    widest = max(
        [int(p.shape[-1]) for p in tparams if p.ndim == 2] + [d])
    # caches for the BACKWARD of one batch (all ops' hidden activations
    # live simultaneously) + one eval pass's transient set
    n_hidden = sum(max(op[3], op[4]) for op in plan if op[0] == "coupling")
    acts = (2 + n_hidden) * batchsize * max(widest, lane) * 4 \
        + 6 * max(n_ev_t, n_ev_v) * max(widest, lane) * 4
    hist = (3 if guarded else 2) * (-(-epochs // 8) * 8) * lane * 4
    best = sum(param_bytes(p) for p in tparams) if track_best else 0
    return 2 * slab + evals + params + consts + acts + hist + best


@functools.partial(
    jax.jit,
    static_argnames=("plan", "tcounts", "mask_slots", "epochs", "batchsize",
                     "n_train", "n_ev_t", "ev_off", "n_ev_v", "count0",
                     "lr", "b1", "b2", "eps", "interpret", "track_best",
                     "guard"),
)
def _run(xs, ths, ws, xev, thev, wev, tparams, mu, nu, masks,
         cparams, *, plan, tcounts, mask_slots, epochs, batchsize,
         n_train, n_ev_t, ev_off, n_ev_v, count0, lr, b1, b2, eps,
         interpret, track_best=False, guard=False):
    n_batches = xs.shape[1]
    d = xs.shape[-1]
    n = ths.shape[-1] if ths is not None else 0
    weighted = ws is not None
    offsets, n_t = _offsets(plan, tcounts)
    n_c = sum(3 for op in plan if op[0] == "affine")
    n_m = len(masks)

    cfg = (n, d, batchsize, n_batches, n_train, n_ev_t, ev_off, n_ev_v,
           count0, lr, b1, b2, eps, n_t, n_c, n_m, track_best, weighted,
           guard)
    kernel = functools.partial(_train_kernel, plan, offsets, mask_slots, cfg)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda e, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    def epoch_spec(a):
        return pl.BlockSpec((1,) + a.shape[1:], lambda e: (e, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [epoch_spec(xs)]
    args = [xs]
    if n:
        in_specs.append(epoch_spec(ths))
        args.append(ths)
    if weighted:
        in_specs.append(epoch_spec(ws))
        args.append(ws)
    ev_args = [xev] + ([thev] if n else []) + ([wev] if weighted else [])
    for a in ev_args:
        in_specs.append(const_spec(a.shape))
        args.append(a)
    for group in (tparams, mu, nu, masks, cparams):
        for p in group:
            in_specs.append(const_spec(p.shape))
            args.append(p)

    out_shape, out_specs = [], []
    for group in (tparams, mu, nu):
        for p in group:
            out_shape.append(jax.ShapeDtypeStruct(p.shape, jnp.float32))
            out_specs.append(const_spec(p.shape))
    for _ in range(2):  # train / valid histories (whole-array blocks)
        out_shape.append(jax.ShapeDtypeStruct((epochs, 1), jnp.float32))
        out_specs.append(const_spec((epochs, 1)))
    if track_best:  # exact best-valid-epoch parameter snapshot
        for p in tparams:
            out_shape.append(jax.ShapeDtypeStruct(p.shape, jnp.float32))
            out_specs.append(const_spec(p.shape))
    if guard:  # per-epoch skipped-update counts (f32 rows like the NLLs)
        out_shape.append(jax.ShapeDtypeStruct((epochs, 1), jnp.float32))
        out_specs.append(const_spec((epochs, 1)))

    out = pl.pallas_call(
        kernel,
        grid=(epochs,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    p_new = out[:n_t]
    mu_new = out[n_t:2 * n_t]
    nu_new = out[2 * n_t:3 * n_t]
    hist_t = out[3 * n_t][:, 0]
    hist_v = out[3 * n_t + 1][:, 0]
    best = out[3 * n_t + 2:3 * n_t + 2 + n_t] if track_best else None
    skips = out[-1][:, 0] if guard else None
    return p_new, mu_new, nu_new, hist_t, hist_v, best, skips


def run_fused_train(
    plan, tcounts, tparams, masks, mask_slots, cparams, mu, nu,
    x, theta, x_valid, theta_valid, key,
    *, epochs, batchsize, shuffle=True, n_train=None, n_valid=None,
    count0=0, lr=1e-3, b1=0.9, b2=0.999, eps=1e-8, interpret=None,
    track_best=False, w=None, w_valid=None, guard_nonfinite=False,
    epoch_keys=None,
):
    """Run the whole training loop as one kernel.

    ``x``/``theta``: normalized training rows; ``x_valid``/``theta_valid``
    the validation split. Shuffle/batching reproduces
    ``train.make_train_program`` exactly: per-epoch
    ``jax.random.permutation`` keys from ``jax.random.split(key, epochs)``,
    final partial batch padded with row 0 and masked out of the loss.

    Returns (params, mu, nu, train_hist, valid_hist, best, skips) with
    the folded trainable params / Adam moments and per-epoch full-split
    NLLs; ``best`` is the folded parameter snapshot at the
    lowest-valid-NLL epoch when ``track_best`` (else None); ``skips``
    the per-epoch non-finite-update counts when ``guard_nonfinite``
    (else None) — guarded steps leave params/moments untouched and do
    not advance the Adam step count (``train.py`` ``skip_nonfinite``
    semantics).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = x.shape[0] if n_train is None else n_train
    nv = x_valid.shape[0] if n_valid is None else n_valid
    n_cond = theta.shape[-1] if theta is not None else 0
    n_batches = -(-n // batchsize)
    n_pad = n_batches * batchsize

    # epoch_keys: explicit per-epoch shuffle keys — the epoch-chunked
    # driver (models/fused_train.py) slices ONE split(key, total_epochs)
    # across its chunks so batch composition matches the single whole-run
    # call (and the jnp program) exactly
    keys = jax.random.split(key, epochs) if epoch_keys is None else epoch_keys
    if shuffle:
        perms = jax.vmap(
            lambda k: jax.random.permutation(k, n).astype(jnp.int32)
        )(keys)
    else:
        perms = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (1, n), 1), (epochs, n))
    idx = jnp.zeros((epochs, n_pad), jnp.int32).at[:, :n].set(perms)
    idx = idx.reshape(epochs, n_batches, batchsize)
    xs = jnp.asarray(x, jnp.float32)[idx]
    ths = jnp.asarray(theta, jnp.float32)[idx] if n_cond else None
    ws = None
    if w is not None:
        # per-row importance weights, gathered with the SAME shuffle
        ws = jnp.asarray(w, jnp.float32).reshape(-1, 1)[idx]

    def pad8(a):
        pad = (-a.shape[0]) % 8
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)
        return a

    # one concatenated eval set (train rows then valid rows, each 8-row
    # aligned so the valid offset stays static) — one pass, two masks
    xev_t = pad8(jnp.asarray(x, jnp.float32))
    ev_off = xev_t.shape[0]
    xev = jnp.concatenate([xev_t, pad8(jnp.asarray(x_valid, jnp.float32))], 0)
    thev = None
    if n_cond:
        thev = jnp.concatenate([
            pad8(jnp.asarray(theta, jnp.float32)),
            pad8(jnp.asarray(theta_valid, jnp.float32))], 0)
    wev = None
    if w is not None:
        wev = jnp.concatenate([
            pad8(jnp.asarray(w, jnp.float32).reshape(-1, 1)),
            pad8(jnp.asarray(w_valid, jnp.float32).reshape(-1, 1))], 0)

    return _run(
        xs, ths, ws, xev, thev, wev,
        tuple(tparams), tuple(mu), tuple(nu), tuple(masks), tuple(cparams),
        plan=plan, tcounts=tcounts, mask_slots=mask_slots, epochs=epochs,
        batchsize=batchsize, n_train=n, n_ev_t=n, ev_off=ev_off,
        n_ev_v=nv, count0=count0, lr=float(lr), b1=float(b1), b2=float(b2),
        eps=float(eps), interpret=interpret, track_best=track_best,
        guard=guard_nonfinite,
    )
