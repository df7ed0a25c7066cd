"""Benchmark: README 5-D conditional RealNVP training + sampling throughput.

Measures, on the attached TPU chip (BASELINE.md protocol — the reference
publishes no numbers, so baselines are measured):

- training samples/s/chip on the README 5-D conditional config
  (3 coupling layers hidden 16 + NormalizationLayer, Adam 1e-3, batch 64,
  reference README.md:54-79) over the reference fixture,
- final train NLL after 50 epochs,
- sampling draws/s at 2^20 conditional draws per call.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

``vs_baseline`` compares against the first recorded TPU measurement
(BENCH_BASELINE.json, written on first run) so cross-round improvements
are visible; 1.0 on the first run.
"""

import json
import os
import time

import numpy as np


def _bench_wide(jax, jnp, df):
    """Flagship emulator config: d=32, n=8, hidden 256, 4 coupling blocks,
    batch 8192 — large enough that the fused Pallas kernels and the MXU
    dominate. Returns train samples/s and sampling draws/s."""
    import optax

    from densityflows_tpu.models.flow import _sample_program
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
    step = make_train_step(optimizer)

    x = jnp.asarray(rng.normal(size=(batch, d)).astype(np.float32))
    theta = jnp.asarray(rng.uniform(0, 1, size=(batch, n_cond)).astype(np.float32))
    mask = jnp.ones((batch,), jnp.float32)
    model = chain
    opt_state = optimizer.init(model)
    model, opt_state, loss = step(model, opt_state, base, x, theta, mask)
    jax.block_until_ready(loss)  # compile
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        model, opt_state, loss = step(model, opt_state, base, x, theta, mask)
    jax.block_until_ready(loss)
    train_sps = iters * batch / (time.perf_counter() - t0)

    n_draws = 1 << 18
    theta_s = jnp.broadcast_to(theta[:1], (n_draws, n_cond))
    r = base.sample(jax.random.key(1), (n_draws,))
    _sample_program(model, None, r, theta_s).block_until_ready()
    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        r = base.sample(jax.random.key(2 + i), (n_draws,))
        out = _sample_program(model, None, r, theta_s)
    out.block_until_ready()
    sample_dps = iters * n_draws / (time.perf_counter() - t0)
    return {"train_sps": train_sps, "sample_dps": sample_dps}


def main():
    import jax
    import jax.numpy as jnp

    import densityflows_tpu as df
    from densityflows_tpu.models.flow import _sample_program

    here = os.path.dirname(os.path.abspath(__file__))
    dat = np.load(os.path.join(here, "tests", "fixtures", "datatest.npz"))
    x, theta = dat["x"], dat["theta"]

    data = df.DataArrays.make(x, theta, rng=0)
    ks = jax.random.split(jax.random.key(0), 3)
    chain = df.flow_chain(
        df.coupling_layer(data, [0, 1, 2], hidden_dim_s=16, hidden_dim_t=16, key=ks[0]),
        df.coupling_layer(data, [2, 3, 4], hidden_dim_s=16, hidden_dim_t=16, key=ks[1]),
        df.coupling_layer(data, [4, 0, 1], hidden_dim_s=16, hidden_dim_t=16, key=ks[2]),
        df.normalization_layer(x, -1.0, 1.0),
    )
    flow = df.Flow(chain, data)

    epochs = 50
    n_train = len(data.partition.training)

    # warmup: compile THE SAME fused 50-epoch program the timed run uses
    # (epochs is a static program parameter), then reset the flow state
    import copy

    warm_flow = df.Flow(copy.deepcopy(chain), data)
    df.train(warm_flow, data, epochs=epochs, verbose=False, key=jax.random.key(1))
    # timed fused training run (compile excluded — throughput, not startup)
    t0 = time.perf_counter()
    df.train(flow, data, epochs=epochs, verbose=False, key=jax.random.key(2))
    # train() blocks on host conversion of the loss histories
    train_time = time.perf_counter() - t0
    train_sps = epochs * n_train / train_time
    final_nll = flow.train_loss[-1]

    # sampling draws/s (donated-buffer jitted sweep, excl. compile)
    n_draws = 1 << 20
    theta_n = flow.prepare_theta((-1.0,), (n_draws,))
    base_draw = lambda k: flow.base.sample(k, (n_draws,))
    r = base_draw(jax.random.key(3))
    _sample_program(flow.model, None, r, theta_n).block_until_ready()  # compile
    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        r = base_draw(jax.random.key(10 + i))
        out = _sample_program(flow.model, None, r, theta_n)
    out.block_until_ready()
    sample_dps = iters * n_draws / (time.perf_counter() - t0)

    # flagship wide config (BASELINE.json config 3): 32-D, 8 conditions,
    # hidden-256 conditioners, 4 blocks — MXU-bound, fused-kernel territory
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
                "final_train_nll": round(float(final_nll), 4),
                "sample_draws_per_sec": round(sample_dps, 1),
                "wide_train_samples_per_sec": round(wide["train_sps"], 1),
                "wide_sample_draws_per_sec": round(wide["sample_dps"], 1),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
