"""Flagship wide-config benchmark: fused vs jnp, f32 vs bf16.

d=32, 8 conditions, hidden-256 conditioners, 4 coupling blocks,
batch 8192 — MXU-bound territory. Prints one JSON line per variant.

Timing method: scanned two-point differencing, interleaved across
variants. Each variant's K training steps run as ONE device program
(``lax.scan`` over the jitted step); per-step time is
(t(K2) − t(K1)) / (K2 − K1), which cancels the per-dispatch constant
exactly. The tunneled single-chip grant makes anything else unreliable:
per-dispatch round-trip latency flips between ~1 ms and ~28 ms for a
whole process lifetime (so blocked OR async per-step loops measure the
tunnel, not the device), and one-off multi-second stalls hit single
dispatches (the cross-round median rejects them). Variants are
interleaved so drift hits all of them equally.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    import densityflows_tpu as df
    from densityflows_tpu.models import layers as L
    from densityflows_tpu.models.flow import _sample_program
    from densityflows_tpu.train import make_train_step

    d, n_cond, hidden, n_blocks, batch = 32, 8, 256, 4, 8192
    rng = np.random.default_rng(0)
    x_ref = rng.normal(size=(512, d)).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(batch, d)).astype(np.float32))
    theta = jnp.asarray(rng.uniform(0, 1, size=(batch, n_cond)).astype(np.float32))
    mask = jnp.ones((batch,), jnp.float32)
    base = df.StandardNormal(d)
    jax.block_until_ready(jnp.sum(x))  # grab the device grant first

    n_draws = 1 << 18
    theta_s = jnp.broadcast_to(theta[:1], (n_draws, n_cond))

    def build(dtype):
        keys = jax.random.split(jax.random.key(0), n_blocks)
        return df.flow_chain(
            *[df.coupling_block(d, None, n=n_cond, key=k,
                                hidden_dim_s=hidden, hidden_dim_t=hidden,
                                dtype=dtype) for k in keys],
            df.normalization_layer(x_ref, -1.0, 1.0),
        )

    K1, K2 = 8, 40  # scan lengths for two-point differencing
    M1, M2 = 2, 10  # sampling-sweep repeat counts

    def make_scan_train(step, k):
        @jax.jit
        def run(model, opt_state, x, theta, mask):
            def body(c, _):
                m, o = c
                m, o, loss = step(m, o, base, x, theta, mask)
                return (m, o), loss

            (m, o), losses = jax.lax.scan(
                body, (model, opt_state), None, length=k)
            return m, o, losses[-1]

        return run

    def make_scan_sample(m_reps):
        @jax.jit
        def run(model, key):
            def body(c, k):
                r = base.sample(k, (n_draws,))
                out = _sample_program(model, None, r, theta_s)
                # full reduce: consuming only out[0, 0] lets XLA dead-code
                # -eliminate every other row of the whole sweep (row-wise
                # independent program) — measured 2.6x "too fast"
                return c + jnp.sum(out), None

            tot, _ = jax.lax.scan(
                body, jnp.float32(0), jax.random.split(key, m_reps))
            return tot  # tiny output; the full sweeps still run on device

        return run

    # -- compile every variant up front (fused flag is a trace-time policy,
    #    so each variant jits fresh closures under its own flag) ----------
    variants = {}
    for tag, dtype, fused in (
        ("fused_f32", jnp.float32, True),
        ("fused_bf16", jnp.bfloat16, True),
        ("jnp_f32", jnp.float32, False),
        ("jnp_bf16", jnp.bfloat16, False),
    ):
        L.set_fused_kernels(fused)
        optimizer = optax.adam(1e-3)
        raw = make_train_step(optimizer)
        model = build(dtype)
        opt_state = optimizer.init(model)
        t1 = make_scan_train(raw, K1)
        t2 = make_scan_train(raw, K2)
        s1 = make_scan_sample(M1)
        s2 = make_scan_sample(M2)
        jax.block_until_ready(t1(model, opt_state, x, theta, mask))
        jax.block_until_ready(t2(model, opt_state, x, theta, mask))
        jax.block_until_ready(s1(model, jax.random.key(1)))
        jax.block_until_ready(s2(model, jax.random.key(1)))
        variants[tag] = dict(t1=t1, t2=t2, s1=s1, s2=s2, model=model,
                             opt=opt_state, dt_train=[], dt_samp=[], loss=0.0)
    L.set_fused_kernels("auto")

    def timed(fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        return time.perf_counter() - t0, out

    rounds = 6
    for i in range(rounds):
        for tag, v in variants.items():
            e1, _ = timed(v["t1"], v["model"], v["opt"], x, theta, mask)
            e2, out = timed(v["t2"], v["model"], v["opt"], x, theta, mask)
            v["model"], v["opt"], loss = out
            v["loss"] = float(np.asarray(loss))
            v["dt_train"].append((e2 - e1) / (K2 - K1))
            e1, _ = timed(v["s1"], v["model"], jax.random.key(i))
            e2, _ = timed(v["s2"], v["model"], jax.random.key(i))
            v["dt_samp"].append((e2 - e1) / (M2 - M1))

    for tag, v in variants.items():
        step_t = float(np.median(v["dt_train"]))
        samp_t = float(np.median(v["dt_samp"]))
        print(json.dumps({
            "variant": tag,
            "train_samples_per_sec": round(batch / step_t, 1),
            "sample_draws_per_sec": round(n_draws / samp_t, 1),
            "ms_per_step": round(step_t * 1e3, 3),
            "final_loss": round(v["loss"], 4),
        }))


if __name__ == "__main__":
    main()
