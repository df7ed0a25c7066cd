"""At which hidden width does the 10M-draws/s/chip sweep hold at d=128?

BENCH_r05dev anchored the pod config's sweep at 6.90M draws/s/chip with
hidden 512 (20% of roofline — the forward fold is traffic-bound, so
narrower conditioners should trade FLOPs for rate). This probe measures
the θ-grid sweep rate at hidden ∈ {128, 256, 512}, interleaved in one
session (two-point scan differencing), to state the width at which one
chip alone crosses 10M.

Run on the TPU:
    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/d128_width_probe.py
"""

import json
import time

import numpy as np

HIDDENS = (128, 256, 512)


def main():
    import jax
    import jax.numpy as jnp

    import densityflows_tpu as df

    d, n_cond, n_blocks = 128, 8, 4
    g, n_per = 64, 4096
    total = g * n_per
    rng = np.random.default_rng(0)
    x_ref = rng.normal(size=(512, d)).astype(np.float32)
    thetas = jnp.asarray(
        rng.uniform(0, 1, size=(g, n_cond)).astype(np.float32))
    theta_rows = jnp.repeat(thetas, n_per, axis=0)
    base = df.StandardNormal(d)

    def build(hidden):
        keys = jax.random.split(jax.random.key(0), n_blocks)
        return df.flow_chain(
            *[
                df.coupling_block(d, None, n=n_cond, key=k,
                                  hidden_dim_s=hidden,
                                  hidden_dim_t=hidden,
                                  joint_conditioner=True)
                for k in keys
            ],
            df.normalization_layer(x_ref, -1.0, 1.0),
        )

    def make_sweep(chain, m):
        @jax.jit
        def run(key):
            def body(c, k):
                r = base.sample(k, (total,))
                out = chain.forward_(r, theta_rows)
                return c + jnp.sum(out), None

            tot, _ = jax.lax.scan(body, jnp.float32(0),
                                  jax.random.split(key, m))
            return tot

        return run

    def timed(f, *a):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        return time.perf_counter() - t0

    m1, m2, reps = 2, 10, 5
    progs = {h: (make_sweep(build(h), m1), make_sweep(build(h), m2))
             for h in HIDDENS}
    k = jax.random.key(5)
    for lo, hi in progs.values():
        timed(lo, k), timed(hi, k)

    rates = {h: [] for h in HIDDENS}
    for _ in range(reps):
        for h, (lo, hi) in progs.items():  # interleaved
            t_lo = timed(lo, k)
            t_hi = timed(hi, k)
            rates[h].append(total * (m2 - m1) / (t_hi - t_lo))

    out = {}
    for h, v in rates.items():
        med = float(np.median(v))
        out[f"h{h}_sweep_draws_per_sec"] = round(med, 1)
        out[f"h{h}_crosses_10m_per_chip"] = med >= 10e6
    print(json.dumps(out))


if __name__ == "__main__":
    main()
