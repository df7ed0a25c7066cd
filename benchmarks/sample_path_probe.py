"""Reconcile the README crossover table's joint-sampling rate (54.8M
draws/s, r3 session) with bench.py's ``wide_sample_draws_per_sec``
(44.98M, r4 driver capture) — VERDICT r4 weak #6.

Hypothesis: they time DIFFERENT programs.

- bench.py's ``make_sample_scan``: ``base.sample`` (threefry draw,
  materialized through HBM) + ``chain.forward_`` (fused chain fwd op,
  external noise input) — the end-user ``Flow.sample`` cost.
- The crossover table: ``maybe_sample_fused`` — the whole-chain kernel
  with the IN-KERNEL PRNG (no external draw, no HBM round trip for r).

This probe measures both INTERLEAVED in one session (two-point scan
differencing, Δt/ΔM) at the exact bench wide config so the comparison is
tunnel-mode-proof. Run on the TPU:

    python benchmarks/sample_path_probe.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import densityflows_tpu as df
    from densityflows_tpu.models import fused_chain as fc

    d, n_cond, hidden, n_blocks = 32, 8, 256, 4
    n_draws = 1 << 18
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
    theta1 = jnp.asarray(
        rng.uniform(0, 1, size=(1, n_cond)).astype(np.float32))
    theta_rows = jnp.broadcast_to(theta1, (n_draws, n_cond))

    def make_draw_fold(m):
        @jax.jit
        def run(key):
            def body(c, k):
                r = base.sample(k, (n_draws,))
                out = chain.forward_(r, theta_rows)
                return c + jnp.sum(out), None

            tot, _ = jax.lax.scan(body, jnp.float32(0),
                                  jax.random.split(key, m))
            return tot

        return run

    def make_inkernel(m):
        @jax.jit
        def run(key):
            def body(c, k):
                out = fc.maybe_sample_fused(chain, k, n_draws, d, theta1)
                return c + jnp.sum(out), None

            tot, _ = jax.lax.scan(body, jnp.float32(0),
                                  jax.random.split(key, m))
            return tot

        return run

    def timed(f, *a):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        return time.perf_counter() - t0

    m1, m2, reps = 2, 8, 7
    progs = {
        "draw_plus_fold": (make_draw_fold(m1), make_draw_fold(m2)),
        "inkernel_prng": (make_inkernel(m1), make_inkernel(m2)),
    }
    k = jax.random.key(3)
    for lo, hi in progs.values():  # compile
        timed(lo, k), timed(hi, k)

    rates = {name: [] for name in progs}
    for _ in range(reps):
        for name, (lo, hi) in progs.items():  # interleaved
            t_lo = timed(lo, k)
            t_hi = timed(hi, k)
            rates[name].append(n_draws * (m2 - m1) / (t_hi - t_lo))

    out = {name: round(float(np.median(v)), 1) for name, v in rates.items()}
    out["ratio_inkernel_over_draw_fold"] = round(
        out["inkernel_prng"] / out["draw_plus_fold"], 3)
    out["spread"] = {name: [round(min(v), 1), round(max(v), 1)]
                     for name, v in rates.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
