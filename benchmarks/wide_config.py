"""Flagship wide-config benchmark: fused vs jnp, f32 vs bf16.

d=32, 8 conditions, hidden-256 conditioners, 4 coupling blocks,
batch 8192 — MXU-bound territory. Prints one JSON line per variant.
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

    def build(dtype):
        keys = jax.random.split(jax.random.key(0), n_blocks)
        return df.flow_chain(
            *[df.coupling_block(d, None, n=n_cond, key=k,
                                hidden_dim_s=hidden, hidden_dim_t=hidden,
                                dtype=dtype) for k in keys],
            df.normalization_layer(x_ref, -1.0, 1.0),
        )

    def run(tag, dtype, fused, iters=50):
        L.set_fused_kernels(fused)
        jax.clear_caches()
        optimizer = optax.adam(1e-3)
        step = make_train_step(optimizer)
        model = build(dtype)
        opt_state = optimizer.init(model)
        model, opt_state, loss = step(model, opt_state, base, x, theta, mask)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            model, opt_state, loss = step(model, opt_state, base, x, theta, mask)
        final = float(np.asarray(loss))
        dt = time.perf_counter() - t0
        train_sps = iters * batch / dt

        n_draws = 1 << 18
        theta_s = jnp.broadcast_to(theta[:1], (n_draws, n_cond))
        r = base.sample(jax.random.key(1), (n_draws,))
        _sample_program(model, None, r, theta_s).block_until_ready()
        t0 = time.perf_counter()
        reps = 20
        for i in range(reps):
            out = _sample_program(
                model, None, base.sample(jax.random.key(2 + i), (n_draws,)),
                theta_s,
            )
        np.asarray(out[0, 0])
        sample_dps = reps * n_draws / (time.perf_counter() - t0)
        print(json.dumps({
            "variant": tag,
            "train_samples_per_sec": round(train_sps, 1),
            "sample_draws_per_sec": round(sample_dps, 1),
            "ms_per_step": round(dt / iters * 1e3, 3),
            "final_loss": round(final, 4),
        }))

    run("fused_f32", jnp.float32, True)
    run("fused_bf16", jnp.bfloat16, True)
    run("jnp_f32", jnp.float32, False)
    run("jnp_bf16", jnp.bfloat16, False)
    L.set_fused_kernels("auto")


if __name__ == "__main__":
    main()
