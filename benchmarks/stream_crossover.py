"""Envelope map at realistic dataset scale (VERDICT r4 item 8).

Measures, on hardware, the per-epoch cost of the THREE train paths —

- jnp program (`train.make_train_program`, raw dispatch),
- resident whole-run kernel (where it still fits),
- STREAMING kernel (per-batch HBM blocks + snapshot evals, r5)

— at the reference width (5-D, hidden-16 conditioners, batch 64) across
row counts spanning the resident envelope boundary (~10-15k rows) into
streaming territory: 2k / 10k / 50k / 200k rows. Two-point raw-program
timing (Δt/Δepochs, LO/HI interleaved across paths) per the r4
methodology — whole train() calls are never timed.

Run on the TPU:
    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/stream_crossover.py
"""

import json
import time

import numpy as np


def _timed(fn):
    import jax

    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    return time.perf_counter() - t0


def measure_rows(n_rows, reps=5, gap_jnp=None):
    import jax
    import jax.numpy as jnp

    import densityflows_tpu as df
    from densityflows_tpu.models.fused_train import (
        _check_budget,
        chain_train_fold,
    )
    from densityflows_tpu.models.fused_train import (
        UnsupportedFusedTrain,
    )
    from densityflows_tpu.ops.pallas_train import run_fused_train
    from densityflows_tpu.ops.pallas_train_stream import (
        eval_snapshots,
        run_fused_train_stream,
    )
    from densityflows_tpu.train import _default_adam, make_train_program

    rng = np.random.default_rng(0)
    x = rng.normal(size=(n_rows, 5)).astype(np.float32)
    th = rng.uniform(-1, 2, size=(n_rows, 1)).astype(np.float32)
    data = df.DataArrays.make(x, th, rng=0)
    ks = jax.random.split(jax.random.key(0), 3)
    chain = df.flow_chain(
        df.coupling_layer(data, [0, 1, 2], hidden_dim_s=16,
                          hidden_dim_t=16, key=ks[0]),
        df.coupling_layer(data, [2, 3, 4], hidden_dim_s=16,
                          hidden_dim_t=16, key=ks[1]),
        df.coupling_layer(data, [4, 0, 1], hidden_dim_s=16,
                          hidden_dim_t=16, key=ks[2]),
        df.normalization_layer(x, -1.0, 1.0),
    )
    flow = df.Flow(chain, data)
    batchsize = 64

    x_t, th_t = data.normalized_training_data(flow.metadata)
    x_v, th_v = data.normalized_validation_data(flow.metadata)
    x_t, th_t = jnp.asarray(x_t), jnp.asarray(th_t)
    x_v, th_v = jnp.asarray(x_v), jnp.asarray(th_v)
    n_train = x_t.shape[0]
    key = jax.random.key(2)
    opt = _default_adam()

    # --- jnp raw program (make_train_program caches per epoch count) -------
    def run_jnp(e):
        prog = make_train_program(opt, batchsize, e)
        model = jax.tree_util.tree_map(jnp.array, flow.model)
        opt_state = opt.init(model)
        jax.block_until_ready((model, opt_state))
        return _timed(lambda: prog(
            model, opt_state, flow.base, x_t, th_t, x_v, th_v, key)[2])

    # --- folded kernels -----------------------------------------------------
    (plan, tcounts, tparams, masks, mask_slots, cparams, _fs,
     _uf) = chain_train_fold(flow.model)
    mu0 = [jnp.zeros_like(p) for p in tparams]
    nu0 = [jnp.zeros_like(p) for p in tparams]

    def resident_ok(e):
        try:
            _check_budget(plan, tparams, cparams, n_train, x_v.shape[0],
                          5, 1, batchsize, e)
            return True
        except UnsupportedFusedTrain:
            return False

    # each timed call must be ONE program dispatch (the r4 raw-program
    # discipline): gather + kernel (+ snapshot evals for the stream
    # path) are all traced into a single jitted wrapper — an eager
    # multi-dispatch call buries the Δepochs signal under the tunnel's
    # per-dispatch constant (~28 ms in slow mode; measured med ≈ 0)
    import functools

    @functools.lru_cache(maxsize=None)
    def resident_prog(e):
        @jax.jit
        def prog(tp, m0, v0):
            out = run_fused_train(
                plan, tcounts, list(tp), masks, mask_slots, cparams,
                list(m0), list(v0), x_t, th_t, x_v, th_v, key,
                epochs=e, batchsize=batchsize)
            return out[3]

        return prog

    @functools.lru_cache(maxsize=None)
    def stream_prog(e):
        @jax.jit
        def prog(tp, m0, v0):
            p, m, v, snaps, _ = run_fused_train_stream(
                plan, tcounts, list(tp), masks, mask_slots, cparams,
                list(m0), list(v0), x_t, th_t, key,
                epochs=e, batchsize=batchsize)
            tl = eval_snapshots(list(snaps), list(cparams), x_t, th_t,
                                None, plan=plan, tcounts=tuple(tcounts))
            vl = eval_snapshots(list(snaps), list(cparams), x_v, th_v,
                                None, plan=plan, tcounts=tuple(tcounts))
            return tl, vl

        return prog

    args3 = (tuple(tparams), tuple(mu0), tuple(nu0))

    def run_resident(e):
        return _timed(lambda: resident_prog(e)(*args3))

    def run_stream(e):
        return _timed(lambda: stream_prog(e)(*args3))

    # two-point gap sizing (CLAUDE.md rule: gap × per-epoch time must be
    # ≳10× per-call jitter, ~10-50 ms on bad days): target ≥ ~250 ms of
    # device-time signal per gap, estimated from the batch count — and
    # the kernels are ~10× faster per epoch, so their gap is 8× wider
    n_batches = -(-n_train // batchsize)
    if gap_jnp is None:
        est_jnp = n_batches * 40e-6  # ~40 µs per jnp batch step
        gap_jnp = max(4, int(0.25 / est_jnp))
    gap_kernel = 8 * gap_jnp
    gaps = {"jnp": (2, 2 + gap_jnp), "stream": (2, 2 + gap_kernel),
            "resident": (2, 2 + gap_kernel)}

    paths = {"jnp": run_jnp, "stream": run_stream}
    if resident_ok(gaps["resident"][1]):
        paths["resident"] = run_resident

    out = {"rows": n_rows, "batch": batchsize, "n_batches": n_batches}
    for _ in range(3):
        for name, f in paths.items():  # compile LO and HI
            lo_e, hi_e = gaps[name]
            f(lo_e), f(hi_e)
        us_per_epoch = {name: [] for name in paths}
        for _ in range(reps):
            for name, f in paths.items():  # interleaved
                lo_e, hi_e = gaps[name]
                t_lo = f(lo_e)
                t_hi = f(hi_e)
                us_per_epoch[name].append(
                    (t_hi - t_lo) / (hi_e - lo_e) * 1e6)
        meds = {name: float(np.median(v))
                for name, v in us_per_epoch.items()}
        if all(m > 0 for m in meds.values()):
            break
        # jitter-dominated: double every gap and retry
        gaps = {name: (lo_e, lo_e + 2 * (hi_e - lo_e))
                for name, (lo_e, hi_e) in gaps.items()}
    for name, med in meds.items():
        out[f"{name}_us_per_epoch"] = round(med, 1)
        out[f"{name}_samples_per_sec"] = round(n_train / (med / 1e6), 1)
    if out.get("stream_us_per_epoch", 0) > 0 and "jnp_us_per_epoch" in out:
        out["stream_speedup_vs_jnp"] = round(
            out["jnp_us_per_epoch"] / out["stream_us_per_epoch"], 2)
    return out


def main():
    results = []
    for n_rows in (2_000, 10_000, 50_000, 200_000):
        r = measure_rows(n_rows)
        print(json.dumps(r), flush=True)
        results.append(r)
    print(json.dumps({"table": results}))


if __name__ == "__main__":
    main()
