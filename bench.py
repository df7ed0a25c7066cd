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
(50 vs 10 epochs; M reps of a sweep inside one ``lax.scan`` at two
lengths) and the rate is computed from the difference, which cancels the
tunnel's per-dispatch constant exactly (it flips between ~1 ms and
~28 ms per process lifetime; see docs/design.md §3 postmortem). Scan
bodies reduce over EVERY output element so XLA cannot dead-code-eliminate
rows. ``vs_baseline`` compares against the first recorded TPU measurement
(BENCH_BASELINE.json, written on first run).
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


def _bench_wide(jax, jnp, df):
    """Flagship emulator config: d=32, n=8, hidden 256, 4 coupling blocks,
    batch 8192. Train steps scanned at two lengths (dispatch-cancelled);
    sampling via the auto-routed path (whole-chain kernel at this size)."""
    import optax

    from densityflows_tpu.train import make_train_step

    d, n_cond, hidden, n_blocks, batch = 32, 8, 256, 4, 8192
    rng = np.random.default_rng(0)
    x_ref = rng.normal(size=(512, d)).astype(np.float32)
    keys = jax.random.split(jax.random.key(0), n_blocks)
    chain = df.flow_chain(
        *[
            df.coupling_block(d, None, n=n_cond, key=k,
                              hidden_dim_s=hidden, hidden_dim_t=hidden)
            for k in keys
        ],
        df.normalization_layer(x_ref, -1.0, 1.0),
    )
    base = df.StandardNormal(d)
    optimizer = optax.adam(1e-3)
    # mixed precision: bf16 conditioner MXU passes, f32 master state —
    # the fastest supported train mode at this config (README §Performance)
    step = make_train_step(optimizer, mixed_precision=True)

    x = jnp.asarray(rng.normal(size=(batch, d)).astype(np.float32))
    theta = jnp.asarray(
        rng.uniform(0, 1, size=(batch, n_cond)).astype(np.float32))
    mask = jnp.ones((batch,), jnp.float32)
    opt_state = optimizer.init(chain)

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

    # ~1 ms/step at this config: a 6-step gap (~6 ms) drowns in tunnel
    # jitter — use a 56-step gap so the signal dominates
    train_sps = _scan_rate(make_train_scan, batch, chain, opt_state,
                           m1=8, m2=64)

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

    # roofline/MFU: conditioner matmul FLOPs per sample; training ≈ 3×
    # forward (backward re-does each matmul twice: dL/dW and dL/dx)
    fwd_flops = _mlp_flops_per_sample(chain)
    peak, kind = _device_peak_flops(jax)
    return {
        "train_sps": train_sps,
        "sample_dps": sample_dps,
        "train_tflops": train_sps * 3 * fwd_flops / 1e12,
        "train_mfu": train_sps * 3 * fwd_flops / peak,
        "sample_mfu": sample_dps * fwd_flops / peak,
        "flops_per_sample_fwd": fwd_flops,
        "peak_tflops_bf16": peak / 1e12,
        "device_kind": kind,
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

    n_train = len(data.partition.training)

    # two-point training rate: whole-run programs at 10 and 50 epochs
    # (each is ONE fused device program; the time difference is pure
    # device compute for 40 epochs). Warm both programs first.
    for epochs in (EPOCHS_LO, EPOCHS_HI):
        df.train(build_flow(), data, epochs=epochs, verbose=False,
                 key=jax.random.key(1))
    diffs = []
    for _ in range(REPS):
        f_lo, f_hi = build_flow(), build_flow()
        t0 = time.perf_counter()
        df.train(f_lo, data, epochs=EPOCHS_LO, verbose=False,
                 key=jax.random.key(2))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.train(f_hi, data, epochs=EPOCHS_HI, verbose=False,
                 key=jax.random.key(2))
        t_hi = time.perf_counter() - t0
        diffs.append((t_hi - t_lo) / (EPOCHS_HI - EPOCHS_LO))
    train_sps = n_train / float(np.median(diffs))
    # spread across reps (the tunnel's dispatch-mode flips dominate it):
    # report so the headline is quotable as median ± spread
    q25, q75 = np.percentile(diffs, [75, 25])  # note: rate is 1/time
    train_sps_lo, train_sps_hi = n_train / float(q25), n_train / float(q75)

    # correctness contract: final NLL after the reference's 50 epochs
    flow = build_flow()
    df.train(flow, data, epochs=50, verbose=False, key=jax.random.key(1))
    final_nll = flow.train_loss[-1]

    # sampling draws/s (scanned two-point sweep over the trained flow)
    sample_dps = _sample_rate(flow, 1 << 20, (-1.0,))

    # flagship wide config (BASELINE.json config 3)
    wide = _bench_wide(jax, jnp, df)

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
                "sample_draws_per_sec": round(sample_dps, 1),
                "wide_train_samples_per_sec": round(wide["train_sps"], 1),
                "wide_sample_draws_per_sec": round(wide["sample_dps"], 1),
                "wide_train_tflops": round(wide["train_tflops"], 2),
                "wide_train_mfu": round(wide["train_mfu"], 4),
                "wide_sample_mfu": round(wide["sample_mfu"], 4),
                "wide_flops_per_sample_fwd": wide["flops_per_sample_fwd"],
                "peak_tflops_bf16": wide["peak_tflops_bf16"],
                "device_kind": wide["device_kind"],
                "timing": "two-point dispatch-cancelled (docs/design.md §3)",
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
