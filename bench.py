"""Benchmark: README 5-D conditional RealNVP training + sampling throughput.

Measures, on the attached TPU chip (BASELINE.md protocol — the reference
publishes no numbers, so baselines are measured):

- training samples/s/chip on the README 5-D conditional config
  (3 coupling layers hidden 16 + NormalizationLayer, Adam 1e-3, batch 64,
  reference README.md:54-79) over the reference fixture,
- final train NLL after 50 epochs,
- sampling draws/s at 2^20 conditional draws per call,
- the wide emulator config (d=32, n=8, hidden 256, 4 blocks, batch 8192).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Timing method: two-point differencing — the workload runs at two sizes
(510 vs 10 epochs; M reps of a sweep inside one ``lax.scan`` at two
lengths) and the rate is computed from the difference, which cancels the
tunnel's per-dispatch constant exactly (it flips between ~1 ms and
~28 ms per process lifetime; see docs/design.md §3 postmortem). The
headline train rate times RAW program dispatches (one dispatch per timed
call, LO/HI interleaved across both train paths) — never whole
``df.train()`` calls, whose seconds of per-call host work made the
r02/r03 headlines session-incomparable (design.md §12). Scan bodies
reduce over EVERY output element so XLA cannot dead-code-eliminate rows.
``vs_baseline`` compares against the first recorded TPU measurement
(BENCH_BASELINE.json, written on first run — a r01 jnp-path anchor, so
the fused-kernel headline reads as a genuine multiple of it).
"""

import json
import os
import time

import numpy as np

# 500-epoch gap: the README config is so small (~15 batches/epoch of
# batch-64) that a 40-epoch difference (~12 ms of device time) drowns in
# per-call jitter — the wider gap puts the signal well above it
EPOCHS_LO, EPOCHS_HI = 10, 510
M1, M2, REPS = 2, 8, 5
TRAIN_REPS = 10


def _timed(fn, *args):
    import jax

    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


# bf16 matmul peak by device kind (dense, per chip). The conditioner
# matmuls run bf16 under mixed_precision=True; f32 work on the MXU runs
# at ~half these rates, so bf16 peak is the honest roofline denominator
# for the wide mixed-precision train number.
_PEAK_BF16 = {
    "v5 lite": 197e12, "v5e": 197e12, "v5litepod": 197e12,
    "v4": 275e12, "v5p": 459e12, "v6": 918e12, "trillium": 918e12,
    "v3": 123e12, "v2": 45e12,
}


def _device_peak_flops(jax):
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    for key, peak in _PEAK_BF16.items():
        if key in kind:
            return peak, kind
    return 197e12, kind or "unknown (assumed v5e)"


def _mlp_flops_per_sample(model):
    """Conditioner-matmul FLOPs for ONE sample's forward pass: 2·Σ|W|
    over every dense layer of every conditioner MLP in the model. The
    elementwise affine/ldj work is negligible next to these (the FLOPs
    model behind the roofline/MFU figure, BASELINE.md north star)."""
    import jax
    from densityflows_tpu.ops.mlp import MLP

    nodes = jax.tree_util.tree_flatten(
        model, is_leaf=lambda n: isinstance(n, MLP)
    )[0]
    return sum(
        2 * int(np.prod(w.shape))
        for n in nodes if isinstance(n, MLP)
        for w in n.weights
    )


def _scan_rate(make_scan, work_per_rep, *args, m1=M1, m2=M2):
    """work/s via two-point scan differencing; median over REPS.

    The scan-length gap must put the device-time signal (Δm steps) well
    above the tunnel's per-call jitter — callers with fast per-step
    bodies pass a wider (m1, m2). If the median difference still comes
    out non-positive (jitter-dominated), the gap is doubled and the
    measurement retried rather than returning a negative rate."""
    for _ in range(4):
        f1, f2 = make_scan(m1), make_scan(m2)
        f1(*args), f2(*args)  # compile both lengths
        ds = []
        for _ in range(REPS):
            t1 = _timed(f1, *args)
            t2 = _timed(f2, *args)
            ds.append((t2 - t1) / (m2 - m1))
        d = float(np.median(ds))
        if d > 0:
            return work_per_rep / d
        m2 *= 2
    raise RuntimeError(
        f"two-point measurement stayed jitter-dominated up to m2={m2}"
    )


def measure_train_paths(jax, df, flow, data, *, reps=TRAIN_REPS,
                        lo=EPOCHS_LO, hi=EPOCHS_HI, fused_hi=None,
                        batchsize=64, verbose=False):
    """Raw-program interleaved two-point rates for BOTH train paths.

    Each timed call is ONE program dispatch: the jnp path times the raw
    ``make_train_program`` callable on pre-placed device inputs; the
    fused path times a jitted wrapper around ``run_fused_train`` on
    pre-folded params. LO/HI interleaved across paths; rate = Δt/Δepochs
    (median over reps). Whole ``df.train()`` calls are NOT timed — their
    ~seconds of per-call host work swamps the device signal and made the
    r02/r03 headline incomparable across sessions (design.md §12).

    Returns ``(jnp_samples_per_sec, fused_samples_per_sec, details)``.
    """
    import jax.numpy as jnp

    from densityflows_tpu.models.fused_train import chain_train_fold
    from densityflows_tpu.ops.pallas_train import run_fused_train
    from densityflows_tpu.train import _default_adam, make_train_program

    # the fused kernel is ~10× faster per epoch, so its two-point gap
    # must be ~10× wider for the same signal-to-jitter ratio (a 500-epoch
    # gap is only ~28 ms of device time — measured ±30% rep spread)
    if fused_hi is None:
        fused_hi = lo + 8 * (hi - lo)

    opt = _default_adam()
    x_t, th_t = data.normalized_training_data(flow.metadata)
    x_v, th_v = data.normalized_validation_data(flow.metadata)
    x_t, th_t = jnp.asarray(x_t), jnp.asarray(th_t)
    x_v, th_v = jnp.asarray(x_v), jnp.asarray(th_v)
    n_train = x_t.shape[0]
    key = jax.random.key(2)

    progs = {e: make_train_program(opt, batchsize, e)
             for e in (lo, hi)}

    def run_jnp(e):
        # fresh device copies: the program donates (model, opt_state)
        model = jax.tree_util.tree_map(jnp.array, flow.model)
        opt_state = opt.init(model)
        jax.block_until_ready((model, opt_state))
        t0 = time.perf_counter()
        out = progs[e](model, opt_state, flow.base, x_t, th_t, x_v, th_v,
                       key)
        jax.block_until_ready(out[2])
        return time.perf_counter() - t0

    (plan, tcounts, tparams, masks, mask_slots, cparams, _fold_state,
     _unfold) = chain_train_fold(flow.model)
    mu0 = [jnp.zeros_like(p) for p in tparams]
    nu0 = [jnp.zeros_like(p) for p in tparams]

    def make_fused(e):
        @jax.jit
        def run(tp, mu, nu, k):
            out = run_fused_train(
                plan, tcounts, list(tp), masks, mask_slots, cparams,
                list(mu), list(nu), x_t, th_t, x_v, th_v, k,
                epochs=e, batchsize=batchsize)
            return out[3]  # train history: blocks on kernel completion

        return run

    fused_progs = {e: make_fused(e) for e in (lo, fused_hi)}

    def run_fused(e):
        t0 = time.perf_counter()
        out = fused_progs[e](tuple(tparams), tuple(mu0), tuple(nu0), key)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    # warm (compile) all four programs
    for e in (lo, hi):
        tj = run_jnp(e)
        if verbose:
            print(f"warm jnp epochs={e}: {tj:.3f}s", flush=True)
    for e in (lo, fused_hi):
        tf = run_fused(e)
        if verbose:
            print(f"warm fused epochs={e}: {tf:.3f}s", flush=True)

    dj, dfu = [], []
    for r in range(reps):
        tj_lo = run_jnp(lo)
        tf_lo = run_fused(lo)
        tj_hi = run_jnp(hi)
        tf_hi = run_fused(fused_hi)
        dj.append((tj_hi - tj_lo) / (hi - lo))
        dfu.append((tf_hi - tf_lo) / (fused_hi - lo))
        if verbose:
            print(f"rep {r}: jnp {dj[-1]*1e6:.1f} us/epoch, "
                  f"fused {dfu[-1]*1e6:.1f} us/epoch", flush=True)

    ej, ef = float(np.median(dj)), float(np.median(dfu))
    if ej <= 0 or ef <= 0:
        raise RuntimeError(
            f"train-path timing jitter-dominated: medians jnp={ej} "
            f"fused={ef} s/epoch")
    details = {
        "jnp_us_per_epoch": ej * 1e6,
        "fused_us_per_epoch": ef * 1e6,
        "jnp_spread_us": [min(dj) * 1e6, max(dj) * 1e6],
        "fused_spread_us": [min(dfu) * 1e6, max(dfu) * 1e6],
        "n_train": n_train,
    }
    return n_train / ej, n_train / ef, details


def guard_parity_case(jax, df):
    """NaN-poisoned skip_nonfinite parity fixture — ONE definition shared
    by this gate, benchmarks/guard_probe.py, and
    tests/test_fused_train.py, so the hardware gate can never drift from
    the CPU test it mirrors. Rows 5/40/77 are poisoned so several (but
    not all) batches per epoch go non-finite at batchsize 16."""
    rng = np.random.default_rng(11)
    x = rng.normal(size=(120, 4)).astype(np.float32)
    x[[5, 40, 77], 1] = np.nan
    data = df.DataArrays.make(x, rng=0)

    def build():
        return df.Flow(df.flow_chain(
            df.coupling_layer(data, [0, 1], key=jax.random.key(0),
                              hidden_dim_s=8, hidden_dim_t=8),
            df.coupling_layer(data, [2, 3], key=jax.random.key(1),
                              hidden_dim_s=8, hidden_dim_t=8),
        ), data)

    return data, build


def fused_step_grads_gate(jax, df):
    """On-hardware parity of the grads-only step kernel
    (ops/pallas_step — the mesh-DP and streaming-trainer step since r5)
    vs jax.value_and_grad through the fold embedding. One batch with a
    clamped joint layer, padded rows, and batch tiling; raises past
    1e-3 (measured ~1e-7 in interpret and on-chip)."""
    import jax.numpy as jnp

    from densityflows_tpu.models.fused_train import chain_train_fold
    from densityflows_tpu.ops.pallas_step import run_fused_grads
    from densityflows_tpu.train import masked_nll_loss

    rng = np.random.default_rng(1)
    x = rng.normal(size=(100, 5)).astype(np.float32)
    th = rng.uniform(-1, 2, size=(100, 1)).astype(np.float32)
    data = df.DataArrays.make(x, th, rng=0)
    chain = df.flow_chain(
        df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                          hidden_dim_s=16, hidden_dim_t=16),
        df.coupling_layer(data, [2, 3, 4], key=jax.random.key(1),
                          joint_conditioner=True, hidden_dim_s=16,
                          hidden_dim_t=16, max_log_scale=3.0),
        df.normalization_layer(x, -1.0, 1.0),
    )
    flow = df.Flow(chain, data)
    xb, thb = data.normalized_training_data(flow.metadata)
    xb, thb = jnp.asarray(xb[:64]), jnp.asarray(thb[:64])
    mask = jnp.concatenate([jnp.ones(50), jnp.zeros(14)]).astype(
        jnp.float32)

    (plan, tcounts, tparams, masks, mask_slots, cparams, _fs,
     unfold) = chain_train_fold(chain)
    loss_k, grads_k = run_fused_grads(
        xb, thb, mask, tuple(tparams), tuple(masks), tuple(cparams),
        plan=plan, tcounts=tuple(tcounts), mask_slots=tuple(mask_slots),
        tile=32)
    loss_j, grads_j = jax.value_and_grad(masked_nll_loss)(
        chain, flow.base, xb, thb, mask)

    def zero_tpl():
        return jax.tree_util.tree_map(jnp.zeros_like, chain)

    g_unfold = unfold(list(grads_k), zero_tpl())
    err = max(
        [abs(float(loss_k) - float(loss_j))]
        + [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
           for a, b in zip(jax.tree_util.tree_leaves(g_unfold),
                           jax.tree_util.tree_leaves(grads_j)) if a.size])
    if not np.isfinite(err) or err > 1e-3:
        raise RuntimeError(
            f"grads-only step kernel diverged from jax.grad on "
            f"hardware: max err {err}")
    return {"fused_step_grads_max_err": round(err, 9)}


def stream_kernel_parity_gate(jax, df):
    """On-hardware parity of the STREAMING train kernel
    (ops/pallas_train_stream — per-batch HBM blocks + snapshot evals)
    vs the jnp program: strict epoch-1 (1e-3) + short-horizon histories
    + params. Forced through the stream path by failing the resident
    envelope check."""
    import densityflows_tpu.models.fused_train as ft

    rng = np.random.default_rng(13)
    x = rng.normal(size=(400, 5)).astype(np.float32)
    th = rng.uniform(-1, 2, size=(400, 2)).astype(np.float32)
    data = df.DataArrays.make(x, th, rng=0)

    def build():
        return df.Flow(df.flow_chain(
            df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                              hidden_dim_s=12, hidden_dim_t=12),
            df.coupling_layer(data, [2, 3, 4], key=jax.random.key(1),
                              joint_conditioner=True, hidden_dim_s=12,
                              hidden_dim_t=12),
            df.normalization_layer(x, -1.0, 1.0),
        ), data)

    f_j = build()
    df.train(f_j, data, epochs=8, batchsize=32, verbose=False,
             key=jax.random.key(2), fused_kernel=False)

    orig = ft._check_budget

    def always_raise(*a, **k):
        raise ft.UnsupportedFusedTrain("gate: force stream")

    ft._check_budget = always_raise
    try:
        f_s = build()
        ft.train_fused(f_s, data, epochs=8, batchsize=32, verbose=False,
                       key=jax.random.key(2))
    finally:
        ft._check_budget = orig
    if getattr(f_s, "fused_kernel_mode", None) != "stream":
        raise RuntimeError("stream gate did not route through the "
                           "streaming kernel")
    e1 = max(abs(f_j.train_loss[0] - f_s.train_loss[0]),
             abs(f_j.valid_loss[0] - f_s.valid_loss[0]))
    hist = max(
        max(abs(a - b) for a, b in zip(f_j.train_loss, f_s.train_loss)),
        max(abs(a - b) for a, b in zip(f_j.valid_loss, f_s.valid_loss)))
    perr = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(jax.tree_util.tree_leaves(f_j.model),
                        jax.tree_util.tree_leaves(f_s.model)) if a.size)
    finite = np.isfinite(f_s.train_loss).all()
    if not finite or e1 > 1e-3 or hist > 0.1 or perr > 1e-2:
        raise RuntimeError(
            f"streaming kernel diverged from the jnp program on "
            f"hardware: epoch-1 err {e1} (1e-3), history err {hist} "
            f"(0.1), param err {perr} (1e-2), finite={finite}")
    return {"stream_kernel_parity_max_err": round(float(e1), 8),
            "stream_kernel_history_max_err": round(float(hist), 8)}


def surface_parity_case(jax, df):
    """Composite kernel-surface fixture (VERDICT r4 item 2): every
    feature that auto-routes into the whole-run train kernel rides in
    ONE chain — split coupling → permutation → trainable ActNorm →
    clamped JOINT coupling → normalization — trained with the tagged
    ``df.adam(3e-3, b1=0.85)``, per-row importance weights, and
    track_best. ONE definition shared by the hardware gate and the CPU
    interpret test so the two can never drift."""
    rng = np.random.default_rng(5)
    x = rng.normal(size=(160, 5)).astype(np.float32)
    th = rng.uniform(-1, 2, size=(160, 2)).astype(np.float32)
    w = rng.uniform(0.3, 2.5, size=160).astype(np.float32)
    data = df.DataArrays.make(x, th, rng=0)

    def build():
        return df.Flow(df.flow_chain(
            df.coupling_layer(data, [0, 1, 2], key=jax.random.key(0),
                              hidden_dim_s=12, hidden_dim_t=12),
            df.permutation_layer([3, 1, 4, 0, 2]),
            df.actnorm_layer(x),
            df.coupling_layer(data, [1, 2, 3], key=jax.random.key(1),
                              joint_conditioner=True, hidden_dim_s=12,
                              hidden_dim_t=12, max_log_scale=3.0),
            df.normalization_layer(x, -1.0, 1.0),
        ), data)

    return data, build, w


def fused_surface_parity_gate(jax, df, epochs=20):
    """Standing hardware regression gate over the WHOLE auto-routed
    kernel surface (perm folding, ActNorm op, tanh clamp, joint heads,
    weights, track_best, tagged-Adam hyperparams) — converts the one-off
    design.md §12c/e/g probes into an every-driver-run check against the
    Mosaic-lowering bug class (round-2 PRNG sign extension).

    Two tolerances: epoch-1 parity is DETERMINISTIC (measured
    1.4e-5–1.8e-4 across the r4 probes) so it is gated strictly at 1e-3;
    the full history may drift to float-accumulation order over chaotic
    epochs, gated loosely at 0.1. The strict gate pins the regime where
    a systematic per-step numeric bug cannot hide behind chaos."""
    data, build, w = surface_parity_case(jax, df)
    f_j, f_f = build(), build()
    _, best_j = df.train(
        f_j, data, df.adam(3e-3, b1=0.85), epochs=epochs, batchsize=32,
        verbose=False, key=jax.random.key(2), weights=w,
        _track_best=True, fused_kernel=False)
    _, best_f = df.train(
        f_f, data, df.adam(3e-3, b1=0.85), epochs=epochs, batchsize=32,
        verbose=False, key=jax.random.key(2), weights=w,
        _track_best=True, fused_kernel=True)
    finite = (np.isfinite(f_j.train_loss).all()
              and np.isfinite(f_f.train_loss).all())
    e1 = max(abs(f_j.train_loss[0] - f_f.train_loss[0]),
             abs(f_j.valid_loss[0] - f_f.valid_loss[0]))
    hist = max(
        max(abs(a - b) for a, b in zip(f_j.train_loss, f_f.train_loss)),
        max(abs(a - b) for a, b in zip(f_j.valid_loss, f_f.valid_loss)))
    # best-model checks. Cross-path PARAM parity is NOT a valid gate at
    # this horizon: with both argmins == 19 the params still differed by
    # 2.8e-2 on hardware — pure accumulation-order drift amplified in
    # parameter space (losses drifted only 2.9e-3). What IS exact:
    # (a) each path's best model must reproduce its own history minimum
    #     when re-evaluated (the snapshot really is the argmin-epoch
    #     params — the r4 hardware restore check, now standing), and
    # (b) the two paths select the same epoch, or flipped on a near-tie
    #     within the drift tolerance.
    arg_j = int(np.argmin(f_j.valid_loss))
    arg_f = int(np.argmin(f_f.valid_loss))

    def weighted_valid_nll(flow_obj, best_model):
        import jax.numpy as jnp

        x_v, th_v = data.normalized_validation_data(flow_obj.metadata)
        wv = w[np.asarray(data.partition.validation)]
        z, ldj = best_model.inverse(jnp.asarray(x_v), jnp.asarray(th_v))
        lp = np.asarray(flow_obj.base.log_prob(z) + ldj)
        return float(-(wv * lp).sum() / wv.sum())

    self_err = max(
        abs(weighted_valid_nll(f_j, best_j) - min(f_j.valid_loss)),
        abs(weighted_valid_nll(f_f, best_f) - min(f_f.valid_loss)))
    tie_gap = (0.0 if arg_j == arg_f
               else abs(f_j.valid_loss[arg_j] - f_j.valid_loss[arg_f]))
    if not finite or e1 > 1e-3 or hist > 0.1 or self_err > 1e-3 \
            or tie_gap > 0.1:
        raise RuntimeError(
            f"composite kernel-surface parity gate failed: epoch-1 err "
            f"{e1} (strict 1e-3), history err {hist} (0.1), best-model "
            f"self-consistency err {self_err} (1e-3), argmins "
            f"jnp={arg_j} fused={arg_f} (tie gap {tie_gap}), "
            f"finite={finite}")
    return {
        "fused_surface_parity_max_err": round(float(e1), 6),
        "fused_surface_history_max_err": round(float(hist), 6),
        "fused_surface_best_self_err": round(float(self_err), 6),
        "fused_surface_best_argmin": [arg_j, arg_f],
    }


def fused_train_parity_gate(jax, df, data, build_flow, epochs=50):
    """On-hardware loss-history parity of the whole-run train kernel vs
    the jnp program (identical keys ⇒ identical batch composition). The
    CPU interpreter cannot catch Mosaic-lowering bugs (the round-2 PRNG
    sign-extension class, design.md §3b), so this gate runs on every
    driver bench. Raises past tolerance: the histories may drift to
    float-accumulation order over 50 chaotic epochs (measured ~2e-2),
    but divergence or non-finite values mean the kernel is broken.
    """
    f_j, f_f = build_flow(), build_flow()
    df.train(f_j, data, epochs=epochs, verbose=False,
             key=jax.random.key(1), fused_kernel=False)
    df.train(f_f, data, epochs=epochs, verbose=False,
             key=jax.random.key(1), fused_kernel=True)
    errs = [abs(a - b) for a, b in zip(f_j.train_loss, f_f.train_loss)]
    errs += [abs(a - b) for a, b in zip(f_j.valid_loss, f_f.valid_loss)]
    err = max(errs)
    # strict short-horizon companion (VERDICT r4 weak #3): epoch-1 parity
    # is deterministic (~1e-4 measured) — the 0.1 long-horizon tolerance
    # only covers chaotic accumulation drift, not per-step numeric bugs
    err_e1 = max(abs(f_j.train_loss[0] - f_f.train_loss[0]),
                 abs(f_j.valid_loss[0] - f_f.valid_loss[0]))
    finite = (np.isfinite(f_j.train_loss).all()
              and np.isfinite(f_f.train_loss).all())
    if not finite or err > 0.1 or err_e1 > 1e-3:
        raise RuntimeError(
            f"fused-train kernel diverged from the jnp program on "
            f"hardware: max history err {err} (tol 0.1), epoch-1 err "
            f"{err_e1} (strict tol 1e-3), finite={finite} "
            f"(final jnp={f_j.train_loss[-1]}, fused={f_f.train_loss[-1]})")
    # in-kernel non-finite guard (r4 surface growth): NaN-poisoned rows
    # must skip the SAME batch updates as the jnp program — guard math
    # is value-based and could break only in Mosaic lowering, so it too
    # is gated on hardware every run
    dg, build_guard = guard_parity_case(jax, df)
    g_j, g_f = build_guard(), build_guard()
    df.train(g_j, dg, epochs=6, batchsize=16, verbose=False,
             key=jax.random.key(3), skip_nonfinite=True,
             fused_kernel=False)
    df.train(g_f, dg, epochs=6, batchsize=16, verbose=False,
             key=jax.random.key(3), skip_nonfinite=True,
             fused_kernel=True)
    leaves = zip(jax.tree_util.tree_leaves(g_j.model),
                 jax.tree_util.tree_leaves(g_f.model))
    guard_err = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                    for a, b in leaves if a.size)
    if (g_j.skipped_updates != g_f.skipped_updates
            or sum(g_f.skipped_updates) == 0 or guard_err > 1e-3):
        raise RuntimeError(
            f"in-kernel non-finite guard diverged from the jnp program "
            f"on hardware: skips jnp={g_j.skipped_updates} "
            f"fused={g_f.skipped_updates}, param err {guard_err}")

    return {
        "fused_train_parity_max_err": round(float(err), 6),
        "fused_train_epoch1_err": round(float(err_e1), 8),
        "fused_guard_parity_max_err": round(guard_err, 6),
        "final_nll_jnp": float(f_j.train_loss[-1]),
        "final_nll_fused": float(f_f.train_loss[-1]),
    }


def _sample_rate(flow, n_draws, theta):
    import jax
    import jax.numpy as jnp

    theta_n = flow.prepare_theta(theta, (n_draws,))
    model, base = flow.model, flow.base

    def make(m):
        @jax.jit
        def run(key):
            def body(c, k):
                r = base.sample(k, (n_draws,))
                out = model.forward_(r, theta_n)
                return c + jnp.sum(out), None

            tot, _ = jax.lax.scan(body, jnp.float32(0),
                                  jax.random.split(key, m))
            return tot

        return run

    return _scan_rate(make, n_draws, jax.random.key(3))


def _damp_final_weights(jax, df, chain, factor=0.05):
    """Scale every conditioner MLP's final weight/bias so s stays ~±0.2:
    parity chains need NON-zero conditioners (zero-init would make the
    conditioner path invisible to the gate) but raw glorot nets overflow
    exp(s) through 8 couplings — measured ~6e-5 of draws non-finite in
    the pure-jnp fold too, so damping, not the kernel, is the fix."""
    from densityflows_tpu.ops.mlp import MLP

    def damp(node):
        if isinstance(node, MLP):
            ws = list(node.weights)
            ws[-1] = ws[-1] * factor
            return MLP(tuple(ws), node.biases, node.activation)
        return node

    return jax.tree_util.tree_map(
        damp, chain, is_leaf=lambda n: isinstance(n, MLP)
    )


def _fused_parity(jax, jnp, df, chain, base, d, n_cond, theta1):
    """On-hardware parity gate for the TPU-only fused paths (VERDICT r2
    item 4): the CPU interpreter stubs the in-kernel PRNG to zeros and
    skips real Mosaic lowering, so ONLY a real-chip check catches the
    bug class that produced the round-2 sign-extension NaNs
    (docs/design.md §3b). Computes

    - max |Δ log_prob| between the fused whole-chain kernel and the jnp
      oracle at the wide config, and
    - per-dim moment errors of the in-kernel-PRNG sampler vs the jnp
      sampling path (same chain, Monte-Carlo tolerance),

    and FAILS LOUDLY (raises) past tolerance so a silent Mosaic change
    cannot ship through the driver's bench run."""
    from densityflows_tpu.models import fused_chain as fc

    rows = 8192
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32))
    th = jnp.asarray(np.broadcast_to(
        np.asarray(theta1, np.float32), (rows, n_cond)).copy())

    z_o, ldj_o = jax.jit(
        lambda c, xx, tt: fc._jnp_chain(c, xx, tt, "inv", True)
    )(chain, x, th)
    lp_oracle = np.asarray(base.log_prob(z_o) + ldj_o)

    fused = fc.maybe_apply_fused(chain, x, th, "inv", True)
    if fused is None:
        raise RuntimeError(
            "fused whole-chain path did not route at the wide config — "
            "the parity gate has nothing to check (routing regression?)"
        )
    z_f, ldj_f = fused
    lp_fused = np.asarray(base.log_prob(z_f) + ldj_f)
    logprob_err = float(np.max(np.abs(lp_fused - lp_oracle)))
    scale = float(np.median(np.abs(lp_oracle))) + 1.0
    if not np.isfinite(logprob_err) or logprob_err > 5e-3 * scale + 0.05:
        raise RuntimeError(
            f"fused chain log_prob diverged from the jnp oracle: "
            f"max err {logprob_err} (median |logp| {scale})"
        )

    # in-kernel PRNG sampling: moments vs the jnp sampling path, over
    # THREE independent seeds (VERDICT r4 item 6 — one fixed seed is one
    # fixed draw, under which a small persistent sampler bias can hide).
    # Statistic per seed: z = max over d dims of |Δmean| / (√2·se) —
    # both means are MC estimates with standard error se, so their
    # difference has std √2·se and z ~ max of d |N(0,1)| under H0.
    # Gates: every seed z ≤ 5 (false-positive ≈ d·2Φ(-5) ≈ 1.8e-5/seed
    # at d=32) and median-over-seeds z ≤ 4 (noise needs ≥2 of 3 seeds
    # past 4σ: ≈ 3·(d·2Φ(-4))² ≈ 1.2e-5/run — while a persistent ≥4σ
    # bias trips it every run). Whole-gate false-positive rate ≲ 1e-4.
    n_draws = 1 << 18
    theta_row = jnp.asarray(np.asarray(theta1, np.float32))
    zs = []
    for seed in (11, 21, 31):
        s_f = fc.maybe_sample_fused(
            chain, jax.random.key(seed), n_draws, d,
            theta_row.reshape(1, n_cond))
        if s_f is None:
            raise RuntimeError(
                "in-kernel sampler did not route at wide config")
        s_f = np.asarray(s_f)
        r = base.sample(jax.random.key(seed + 1), (n_draws,))
        s_o = np.asarray(jax.jit(
            lambda c, rr, tt: fc._jnp_chain(c, rr, tt, "fwd", False)
        )(chain, r, jnp.broadcast_to(theta_row, (n_draws, n_cond))))
        if not np.isfinite(s_f).all():
            raise RuntimeError(
                "in-kernel sampler produced non-finite draws "
                "(the round-2 PRNG sign-extension bug class)")
        se = s_o.std(0) / np.sqrt(n_draws)
        z = float(np.max(np.abs(s_f.mean(0) - s_o.mean(0))
                         / (np.sqrt(2) * se)))
        std_ratio = s_f.std(0) / s_o.std(0)
        if z > 5.0 or np.abs(std_ratio - 1).max() > 0.05:
            raise RuntimeError(
                f"in-kernel-PRNG sampling moments diverged (seed {seed}): "
                f"max-dim z={z} (tol 5), std ratios {std_ratio}")
        zs.append(z)
    moment_err = float(np.median(zs)) / 4.0  # <1 → median within 4σ
    if moment_err > 1.0:
        raise RuntimeError(
            f"in-kernel-PRNG sampler shows a PERSISTENT moment bias: "
            f"per-seed max-dim z values {zs} (median tol 4)")
    return {
        "fused_parity_max_err": round(logprob_err, 6),
        "fused_sample_moment_err": round(moment_err, 4),
        "fused_sample_moment_z_by_seed": [round(z, 3) for z in zs],
    }


def _bench_wide(jax, jnp, df):
    """Flagship emulator config (BASELINE config 3): d=32, n=8, hidden 256,
    4 coupling blocks, batch 8192, JOINT (s ‖ t) conditioners — measured
    1.79x the split form at equal MFU (docs/design.md §10), so the joint
    parameterization is the flagship from round 3 on; the split form
    (exact reference parameterization) is reported alongside for
    cross-round continuity. Train steps scanned at two lengths
    (dispatch-cancelled); sampling via the auto-routed path."""
    import optax

    from densityflows_tpu.train import make_train_step

    d, n_cond, hidden, n_blocks, batch = 32, 8, 256, 4, 8192
    rng = np.random.default_rng(0)
    x_ref = rng.normal(size=(512, d)).astype(np.float32)
    keys = jax.random.split(jax.random.key(0), n_blocks)

    def build(joint, zero_init=True):
        return df.flow_chain(
            *[
                df.coupling_block(d, None, n=n_cond, key=k,
                                  hidden_dim_s=hidden, hidden_dim_t=hidden,
                                  joint_conditioner=joint,
                                  zero_init_final=zero_init)
                for k in keys
            ],
            df.normalization_layer(x_ref, -1.0, 1.0),
        )

    chain = build(True)          # flagship: joint conditioners
    chain_split = build(False)   # reference parameterization, for continuity
    base = df.StandardNormal(d)
    optimizer = optax.adam(1e-3)
    # mixed precision: bf16 conditioner MXU passes, f32 master state —
    # the fastest supported train mode at this config (README §Performance)
    step = make_train_step(optimizer, mixed_precision=True)

    x = jnp.asarray(rng.normal(size=(batch, d)).astype(np.float32))
    theta = jnp.asarray(
        rng.uniform(0, 1, size=(batch, n_cond)).astype(np.float32))
    mask = jnp.ones((batch,), jnp.float32)

    def make_train_scan(m):
        @jax.jit
        def run(model, opt):
            def body(c, _):
                mm, oo = c
                mm, oo, loss = step(mm, oo, base, x, theta, mask)
                return (mm, oo), loss

            (mm, oo), losses = jax.lax.scan(body, (model, opt), None,
                                            length=m)
            return losses[-1]

        return run

    # ~0.4-1 ms/step at this config: a 6-step gap (~6 ms) drowns in tunnel
    # jitter — use a 56-step gap so the signal dominates
    train_sps = _scan_rate(make_train_scan, batch, chain,
                           optimizer.init(chain), m1=8, m2=64)
    split_sps = _scan_rate(make_train_scan, batch, chain_split,
                           optimizer.init(chain_split), m1=8, m2=64)

    n_draws = 1 << 18
    theta1 = theta[:1]

    def make_sample_scan(m):
        @jax.jit
        def run(key):
            def body(c, k):
                r = base.sample(k, (n_draws,))
                out = chain.forward_(
                    r, jnp.broadcast_to(theta1, (n_draws, n_cond)))
                return c + jnp.sum(out), None

            tot, _ = jax.lax.scan(body, jnp.float32(0),
                                  jax.random.split(key, m))
            return tot

        return run

    sample_dps = _scan_rate(make_sample_scan, n_draws, jax.random.key(1))

    # on-hardware fused-path parity gate (raises on divergence) — gates
    # BOTH conditioner parameterizations, on chains with NON-zero damped
    # random conditioners so the whole conditioner path is exercised
    parity_j = _fused_parity(
        jax, jnp, df, _damp_final_weights(jax, df, build(True, False)),
        base, d, n_cond, np.asarray(theta[0]))
    parity_s = _fused_parity(
        jax, jnp, df, _damp_final_weights(jax, df, build(False, False)),
        base, d, n_cond, np.asarray(theta[0]))
    parity = {
        k: max(parity_j[k], parity_s[k]) for k in parity_j
        if not isinstance(parity_j[k], list)
    }
    parity["fused_sample_moment_z_by_seed"] = [
        max(a, b) for a, b in zip(parity_j["fused_sample_moment_z_by_seed"],
                                  parity_s["fused_sample_moment_z_by_seed"])
    ]

    # roofline/MFU: conditioner matmul FLOPs per sample; training ≈ 3×
    # forward (backward re-does each matmul twice: dL/dW and dL/dx)
    fwd_flops = _mlp_flops_per_sample(chain)
    fwd_flops_split = _mlp_flops_per_sample(chain_split)
    peak, kind = _device_peak_flops(jax)
    return {
        "train_sps": train_sps,
        "sample_dps": sample_dps,
        "train_tflops": train_sps * 3 * fwd_flops / 1e12,
        "train_mfu": train_sps * 3 * fwd_flops / peak,
        "sample_mfu": sample_dps * fwd_flops / peak,
        "flops_per_sample_fwd": fwd_flops,
        "split_train_sps": split_sps,
        "split_train_mfu": split_sps * 3 * fwd_flops_split / peak,
        "split_flops_per_sample_fwd": fwd_flops_split,
        "peak_tflops_bf16": peak / 1e12,
        "device_kind": kind,
        **parity,
    }


def _bench_inference(jax, jnp, df, flow, *, n_particles=1 << 17,
                     smc_hi=64, batch=4096):
    """Hardware anchor for BASELINE config 4 (sharded-particle
    inference) — the engine's headline capability ADDITION over the
    reference (whose only inference tool is the serial rejection loop,
    src/Flows.jl:196-229). Two rates, both two-point timed:

    - ``smc_particle_steps_per_sec``: the public :func:`df.run_smc`
      (ONE jitted program: reweight + systematic resample + n_mh=2 MH
      moves per λ-step) against the trained reference flow's log_prob
      at θ=−1, differenced across two λ-ladder lengths — the per-call
      constant (x0 draw + dispatch + fetch) cancels exactly.
    - ``snpe_weighted_train_samples_per_sec``: the importance-weighted
      train step (the inner loop of every ``fit_posterior`` round)
      scanned at two lengths at a representative posterior config
      (5-D θ posterior conditioned on 5 summaries, hidden 64,
      batch 4096).
    """
    import optax

    from densityflows_tpu.inference import make_weighted_train_step

    # --- SMC over the trained flow's density --------------------------------
    n_mh = 2
    lo, hi = 8, smc_hi
    theta_n = flow.prepare_theta((-1.0,), (n_particles,))

    def log_p(x):
        z, ldj = flow.model.inverse(x, theta_n)
        return flow.base.log_prob(z) + ldj

    def smc_time(n_steps):
        p, _, _ = df.run_smc(
            log_p, d=flow.metadata.d, n_particles=n_particles,
            n_steps=n_steps, key=jax.random.key(4), n_mh=n_mh)
        jax.block_until_ready(p)

    smc_time(lo), smc_time(hi)  # compile both ladder lengths
    rate = None
    for _ in range(4):
        ds = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            smc_time(lo)
            t1 = time.perf_counter()
            smc_time(hi)
            t2 = time.perf_counter()
            ds.append(((t2 - t1) - (t1 - t0)) / (hi - lo))
        d_step = float(np.median(ds))
        if d_step > 0:
            rate = n_particles / d_step
            break
        lo, hi = lo, hi * 2  # widen the gap past the jitter floor
        smc_time(hi)
    if rate is None:
        raise RuntimeError("SMC two-point timing stayed jitter-dominated")

    # --- SMC at the WIDE config (d=32 flow density as the target) -----------
    d_w, n_w, hidden_w, blocks_w = 32, 8, 256, 4
    rngw = np.random.default_rng(2)
    x_ref_w = rngw.normal(size=(256, d_w)).astype(np.float32)
    kw = jax.random.split(jax.random.key(9), blocks_w)
    chain_w = _damp_final_weights(jax, df, df.flow_chain(
        *[
            df.coupling_block(d_w, None, n=n_w, key=k,
                              hidden_dim_s=hidden_w, hidden_dim_t=hidden_w,
                              joint_conditioner=True,
                              zero_init_final=False)
            for k in kw
        ],
        df.normalization_layer(x_ref_w, -1.0, 1.0),
    ))
    base_w = df.StandardNormal(d_w)
    theta_w = jnp.asarray(
        rngw.uniform(0, 1, size=(n_particles, n_w)).astype(np.float32))

    def log_p_wide(x):
        z, ldj = chain_w.inverse(x, theta_w)
        return base_w.log_prob(z) + ldj

    def smc_time_w(n_steps):
        p, _, _ = df.run_smc(
            log_p_wide, d=d_w, n_particles=n_particles,
            n_steps=n_steps, key=jax.random.key(8), n_mh=n_mh)
        jax.block_until_ready(p)

    lo_w, hi_w = 8, smc_hi
    smc_time_w(lo_w), smc_time_w(hi_w)
    rate_w = None
    for _ in range(4):
        ds = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            smc_time_w(lo_w)
            t1 = time.perf_counter()
            smc_time_w(hi_w)
            t2 = time.perf_counter()
            ds.append(((t2 - t1) - (t1 - t0)) / (hi_w - lo_w))
        d_step = float(np.median(ds))
        if d_step > 0:
            rate_w = n_particles / d_step
            break
        hi_w *= 2
        smc_time_w(hi_w)
    if rate_w is None:
        raise RuntimeError("wide-SMC two-point timing jitter-dominated")

    # --- SNPE weighted-step rate --------------------------------------------
    d_th, n_sum, hidden = 5, 5, 64
    rng = np.random.default_rng(3)
    ks = jax.random.split(jax.random.key(6), 3)
    post_chain = df.flow_chain(
        df.coupling_layer(d_th, [0, 1, 2], n=n_sum, key=ks[0],
                          hidden_dim_s=hidden, hidden_dim_t=hidden),
        df.coupling_layer(d_th, [2, 3, 4], n=n_sum, key=ks[1],
                          hidden_dim_s=hidden, hidden_dim_t=hidden),
        df.coupling_layer(d_th, [4, 0, 1], n=n_sum, key=ks[2],
                          hidden_dim_s=hidden, hidden_dim_t=hidden),
    )
    base = df.StandardNormal(d_th)
    optimizer = optax.adam(1e-3)
    wstep = make_weighted_train_step(optimizer)
    th_b = jnp.asarray(rng.normal(size=(batch, d_th)).astype(np.float32))
    x_b = jnp.asarray(
        rng.uniform(0, 1, size=(batch, n_sum)).astype(np.float32))
    w_b = jnp.asarray(
        rng.uniform(0.5, 2.0, size=(batch,)).astype(np.float32))

    def make_snpe_scan(m):
        @jax.jit
        def run(model, opt):
            def body(c, _):
                mm, oo = c
                mm, oo, loss = wstep(mm, oo, base, th_b, x_b, w_b)
                return (mm, oo), loss

            (mm, oo), losses = jax.lax.scan(body, (model, opt), None,
                                            length=m)
            return losses[-1]

        return run

    # gap sizing: the step is ~5.5 µs on hardware (measured ~40% MFU),
    # so a 56-step gap is ~0.3 ms — far under tunnel jitter; m2=1024
    # puts ~5.5 ms of device signal in the difference (two sessions at
    # m2=64 disagreed 10x: 72M vs 739M samples/s — the small gap, not
    # the device)
    snpe_sps = _scan_rate(make_snpe_scan, batch, post_chain,
                          optimizer.init(post_chain), m1=32, m2=1024)
    return {
        "smc_particle_steps_per_sec": rate,
        "smc_config": f"{n_particles} particles, n_mh={n_mh}, target = "
                      "trained 5-D reference flow log_prob",
        "smc_wide_particle_steps_per_sec": rate_w,
        "smc_wide_config": f"{n_particles} particles, n_mh={n_mh}, "
                           "target = wide d=32 h=256 x4 joint flow "
                           "log_prob (BASELINE config 3 chain)",
        "snpe_weighted_train_samples_per_sec": snpe_sps,
        "snpe_config": f"5-D posterior | 5 summaries, hidden 64 x3 "
                       f"layers, batch {batch}, importance-weighted NLL",
    }


def _bench_d128(jax, jnp, df, *, batch=4096, n_per=4096, m2=64):
    """Single-chip anchor for BASELINE config 5 (the pod-scale run:
    128-D flow, multi-host DP + 10M conditional draws/s θ-grid sweep).
    Until round 5 the only 128-D evidence was a 2-process CPU smoke —
    this measures the real per-chip train rate and the θ-sweep draws/s
    (the reference ``forward!`` fold, src/Chains.jl:187-197, via the
    ``Flow.sample_sweep`` program shape) so the driver re-measures them
    every round and the pod target becomes arithmetic: ≥10M draws/s on
    N≥2 hosts holds iff per-chip × chips × 0.8 ≥ 10M.

    Config: d=128, n=8 conditions, hidden 512, 4 joint coupling blocks,
    batch 4096 — the batch obeys the §13 VMEM-prefetch rule
    (batch × hidden × 2 B = 4 MB, the same saved-activation size as the
    known-good wide config; batch 8192 at hidden 512 would cross it and
    regress, design.md §13)."""
    import optax

    from densityflows_tpu.train import make_train_step

    d, n_cond, hidden, n_blocks = 128, 8, 512, 4
    rng = np.random.default_rng(0)
    x_ref = rng.normal(size=(512, d)).astype(np.float32)
    keys = jax.random.split(jax.random.key(0), n_blocks)
    chain = df.flow_chain(
        *[
            df.coupling_block(d, None, n=n_cond, key=k,
                              hidden_dim_s=hidden, hidden_dim_t=hidden,
                              joint_conditioner=True)
            for k in keys
        ],
        df.normalization_layer(x_ref, -1.0, 1.0),
    )
    base = df.StandardNormal(d)
    optimizer = optax.adam(1e-3)
    step = make_train_step(optimizer, mixed_precision=True)

    x = jnp.asarray(rng.normal(size=(batch, d)).astype(np.float32))
    theta = jnp.asarray(
        rng.uniform(0, 1, size=(batch, n_cond)).astype(np.float32))
    mask = jnp.ones((batch,), jnp.float32)

    def make_train_scan(m):
        @jax.jit
        def run(model, opt):
            def body(c, _):
                mm, oo = c
                mm, oo, loss = step(mm, oo, base, x, theta, mask)
                return (mm, oo), loss

            (mm, oo), losses = jax.lax.scan(body, (model, opt), None,
                                            length=m)
            return losses[-1]

        return run

    train_sps = _scan_rate(make_train_scan, batch, chain,
                           optimizer.init(chain), m1=8, m2=m2)

    # θ-grid sweep: G=64 grid points × 4096 draws each per rep — per-row
    # θ exactly as Flow.sample_sweep lays it out; forward_ auto-routes
    # through the fused whole-chain kernel at this width (d≥32, h≥128)
    g = 64
    total = g * n_per
    thetas = jnp.asarray(
        rng.uniform(0, 1, size=(g, n_cond)).astype(np.float32))
    theta_rows = jnp.repeat(thetas, n_per, axis=0)

    # the sweep program mirrors Flow.sample_sweep's routing: past the
    # cache-resident regime the fold runs row-CHUNKED (r5 — 2.9× at this
    # config, design.md §14e)
    from densityflows_tpu.models import flow as flow_mod

    use_chunk = (total >= 2 * flow_mod._FOLD_CHUNK
                 and total * max(hidden, d) * 4
                 > flow_mod._FOLD_CHUNK_BYTES)

    def make_sweep_scan(m):
        @jax.jit
        def run(key):
            def body(c, k):
                r = base.sample(k, (total,))
                if use_chunk:
                    out = flow_mod._sample_program_chunked(
                        chain, r, theta_rows)
                else:
                    out = chain.forward_(r, theta_rows)
                return c + jnp.sum(out), None

            tot, _ = jax.lax.scan(body, jnp.float32(0),
                                  jax.random.split(key, m))
            return tot

        return run

    sweep_dps = _scan_rate(make_sweep_scan, total, jax.random.key(5))

    fwd_flops = _mlp_flops_per_sample(chain)
    peak, _ = _device_peak_flops(jax)
    return {
        "train_sps": train_sps,
        "sweep_dps": sweep_dps,
        "train_mfu": train_sps * 3 * fwd_flops / peak,
        "sweep_mfu": sweep_dps * fwd_flops / peak,
        "flops_per_sample_fwd": fwd_flops,
        "pod_10m_per_chip": sweep_dps >= 10e6,
        "config": f"d=128 n=8 joint(s||t) conditioners, hidden 512 x4 "
                  f"blocks, batch {batch} (design.md SS13 batch rule), "
                  f"mixed_precision train; sweep = {g}-point theta grid "
                  f"x {n_per} draws",
    }


def main():
    import jax
    import jax.numpy as jnp

    import densityflows_tpu as df

    here = os.path.dirname(os.path.abspath(__file__))
    dat = np.load(os.path.join(here, "tests", "fixtures", "datatest.npz"))
    x, theta = dat["x"], dat["theta"]

    data = df.DataArrays.make(x, theta, rng=0)
    ks = jax.random.split(jax.random.key(0), 3)

    def build_flow():
        chain = df.flow_chain(
            df.coupling_layer(data, [0, 1, 2], hidden_dim_s=16,
                              hidden_dim_t=16, key=ks[0]),
            df.coupling_layer(data, [2, 3, 4], hidden_dim_s=16,
                              hidden_dim_t=16, key=ks[1]),
            df.coupling_layer(data, [4, 0, 1], hidden_dim_s=16,
                              hidden_dim_t=16, key=ks[2]),
            df.normalization_layer(x, -1.0, 1.0),
        )
        return df.Flow(chain, data)

    # on-hardware parity gate for the whole-run train kernel (raises on
    # divergence), doubling as the correctness contract: final NLL after
    # the reference's 50 epochs, from the auto-routed (fused) path
    par = fused_train_parity_gate(jax, df, data, build_flow)
    final_nll = par["final_nll_fused"]

    # composite kernel-surface gate: perm/ActNorm/clamp/joint/weights/
    # track_best/tagged-Adam all in one hardware-checked chain
    surf = fused_surface_parity_gate(jax, df)

    # grads-only step kernel gate (the mesh-DP / streaming step, r5)
    stepg = fused_step_grads_gate(jax, df)

    # streaming-kernel parity gate (per-batch HBM blocks, r5)
    streamg = stream_kernel_parity_gate(jax, df)

    # headline: raw-program interleaved two-point rates for BOTH paths.
    # train() auto-routes the reference config through the fused kernel
    # on TPU (train.py fused_kernel='auto'), so the fused rate IS the
    # headline; the jnp rate is reported for continuity with r01-r03.
    flow = build_flow()
    sps_jnp, sps_fused, det = measure_train_paths(jax, df, flow, data)
    train_sps = sps_fused
    n_train = det["n_train"]
    train_sps_lo = n_train / (det["fused_spread_us"][1] / 1e6)
    train_sps_hi = n_train / (det["fused_spread_us"][0] / 1e6)

    # sampling draws/s (scanned two-point sweep over a trained flow)
    df.train(flow, data, epochs=50, verbose=False, key=jax.random.key(1))
    sample_dps = _sample_rate(flow, 1 << 20, (-1.0,))

    # flagship wide config (BASELINE.json config 3)
    wide = _bench_wide(jax, jnp, df)

    # anchor sections are FAIL-SOFT: a transient remote-compile crash
    # (observed: tpu_compile_helper SIGILL on one program shape) in an
    # optional anchor must not zero out the whole driver record — the
    # headline + correctness GATES above stay hard-failing
    errors = {}

    def soft(name, fn, fallback):
        try:
            return fn()
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {str(e)[:160]}"
            return fallback

    # pod-config single-chip anchor (BASELINE.json config 5)
    d128 = soft("d128", lambda: _bench_d128(jax, jnp, df), {
        "train_sps": -1.0, "sweep_dps": -1.0, "train_mfu": 0.0,
        "sweep_mfu": 0.0, "flops_per_sample_fwd": 0,
        "pod_10m_per_chip": False, "config": "FAILED"})

    # inference-engine anchor (BASELINE.json config 4) over the trained flow
    inf = soft("inference", lambda: _bench_inference(jax, jnp, df, flow), {
        "smc_particle_steps_per_sec": -1.0, "smc_config": "FAILED",
        "snpe_weighted_train_samples_per_sec": -1.0,
        "snpe_config": "FAILED"})

    # streaming-kernel envelope anchor (r5): 50k rows at the reference
    # width — the dataset scale where the resident kernel cannot fit and
    # the jnp program used to be the only option (design.md §14c)
    from benchmarks.stream_crossover import measure_rows

    stream = soft("stream50k", lambda: measure_rows(50_000, reps=5), {
        "stream_samples_per_sec": -1.0, "jnp_samples_per_sec": -1.0,
        "stream_speedup_vs_jnp": None})

    value = train_sps
    baseline_path = os.path.join(here, "BENCH_BASELINE.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        vs = value / baseline["value"] if baseline.get("value") else 1.0
    else:
        with open(baseline_path, "w") as f:
            json.dump(
                {
                    "metric": "train_samples_per_sec_per_chip",
                    "value": value,
                    "unit": "samples/s/chip",
                    "device": str(jax.devices()[0]),
                },
                f,
            )
        vs = 1.0

    print(
        json.dumps(
            {
                "metric": "train_samples_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "samples/s/chip",
                "vs_baseline": round(vs, 3),
                "value_range": [round(train_sps_lo, 1), round(train_sps_hi, 1)],
                "final_train_nll": round(float(final_nll), 4),
                "ref_jnp_train_samples_per_sec": round(sps_jnp, 1),
                "ref_fused_train_samples_per_sec": round(sps_fused, 1),
                "fused_train_parity_max_err":
                    par["fused_train_parity_max_err"],
                "fused_train_epoch1_err": par["fused_train_epoch1_err"],
                "fused_guard_parity_max_err":
                    par["fused_guard_parity_max_err"],
                "fused_surface_parity_max_err":
                    surf["fused_surface_parity_max_err"],
                "fused_surface_history_max_err":
                    surf["fused_surface_history_max_err"],
                "fused_surface_best_self_err":
                    surf["fused_surface_best_self_err"],
                "fused_surface_best_argmin":
                    surf["fused_surface_best_argmin"],
                "fused_step_grads_max_err":
                    stepg["fused_step_grads_max_err"],
                "stream_kernel_parity_max_err":
                    streamg["stream_kernel_parity_max_err"],
                "stream_kernel_history_max_err":
                    streamg["stream_kernel_history_max_err"],
                "headline_path": "fused whole-run train kernel "
                                 "(auto-routed; ops/pallas_train.py)",
                "sample_draws_per_sec": round(sample_dps, 1),
                "wide_train_samples_per_sec": round(wide["train_sps"], 1),
                "wide_sample_draws_per_sec": round(wide["sample_dps"], 1),
                "wide_train_tflops": round(wide["train_tflops"], 2),
                "wide_train_mfu": round(wide["train_mfu"], 4),
                "wide_sample_mfu": round(wide["sample_mfu"], 4),
                "wide_flops_per_sample_fwd": wide["flops_per_sample_fwd"],
                "wide_config": "joint(s||t) conditioner, d=32 h=256 x4 "
                               "blocks, batch 8192, mixed_precision "
                               "(flagship since r3; design.md §10)",
                "wide_split_train_samples_per_sec": round(
                    wide["split_train_sps"], 1),
                "wide_split_train_mfu": round(wide["split_train_mfu"], 4),
                "wide_split_flops_per_sample_fwd":
                    wide["split_flops_per_sample_fwd"],
                "fused_parity_max_err": wide["fused_parity_max_err"],
                "fused_sample_moment_err": wide["fused_sample_moment_err"],
                "fused_sample_moment_z_by_seed":
                    wide["fused_sample_moment_z_by_seed"],
                "d128_train_samples_per_sec": round(d128["train_sps"], 1),
                "d128_sweep_draws_per_sec": round(d128["sweep_dps"], 1),
                "d128_train_mfu": round(d128["train_mfu"], 4),
                "d128_sweep_mfu": round(d128["sweep_mfu"], 4),
                "d128_flops_per_sample_fwd": d128["flops_per_sample_fwd"],
                "d128_pod_10m_draws_per_chip": d128["pod_10m_per_chip"],
                "d128_config": d128["config"],
                "smc_particle_steps_per_sec": round(
                    inf["smc_particle_steps_per_sec"], 1),
                "smc_config": inf["smc_config"],
                "smc_wide_particle_steps_per_sec": round(
                    inf.get("smc_wide_particle_steps_per_sec", -1.0), 1),
                "smc_wide_config": inf.get("smc_wide_config", "FAILED"),
                "snpe_weighted_train_samples_per_sec": round(
                    inf["snpe_weighted_train_samples_per_sec"], 1),
                "snpe_config": inf["snpe_config"],
                "stream50k_train_samples_per_sec":
                    stream["stream_samples_per_sec"],
                "stream50k_jnp_samples_per_sec":
                    stream["jnp_samples_per_sec"],
                "stream50k_speedup": stream.get("stream_speedup_vs_jnp"),
                "peak_tflops_bf16": wide["peak_tflops_bf16"],
                "device_kind": wide["device_kind"],
                "timing": "raw-program interleaved two-point "
                          "(docs/design.md §3, §12)",
                "device": str(jax.devices()[0]),
                **({"anchor_errors": errors} if errors else {}),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # pragma: no cover - hardware-transient path
        # a FAILED_PRECONDITION / backend error on the FIRST op after a
        # grant handover is transient (CLAUDE.md TPU notes), and the
        # remote-compile service intermittently drops connections or
        # SIGILLs its helper (observed r5) — retry the whole run once;
        # real failures (e.g. the parity gates) repeat
        if ("FAILED_PRECONDITION" in str(e)
                or "backend" in str(e).lower()
                or "remote_compile" in str(e)):
            import sys

            print(f"[transient TPU error, retrying once: {e}]",
                  file=sys.stderr)
            main()
        else:
            raise
