"""Joint (two-headed) vs split conditioner at the wide config, interleaved.

VERDICT r2 item 2: the split form's MFU ceiling is the narrow first/last
matmuls (K=24, N=16) flanking the 256×256 middle layers; one MLP emitting
(s ‖ t) halves how often they occur and doubles the last head's N. This
probe measures both parameterizations INTERLEAVED with the two-point
scanned method (docs/design.md §3) at batch 8192 / 16384 / 32768, both in
`mixed_precision` (bf16 conditioners) and f32, plus the sampling fold.

Prints one JSON line per (variant, batch). Run on the real TPU; CPU runs
only validate that the programs execute.
"""

import json
import time

import numpy as np

BATCHES = (8192, 16384, 32768)
K1, K2 = 8, 64
M1, M2 = 2, 10
ROUNDS = 6


def main():
    import jax
    import jax.numpy as jnp
    import optax

    import densityflows_tpu as df
    from densityflows_tpu.models.flow import _sample_program
    from densityflows_tpu.train import make_train_step

    d, n_cond, hidden, n_blocks = 32, 8, 256, 4
    rng = np.random.default_rng(0)
    x_ref = rng.normal(size=(512, d)).astype(np.float32)
    base = df.StandardNormal(d)
    jax.block_until_ready(jnp.zeros(1) + 1)  # grab the device grant first

    def build(joint):
        keys = jax.random.split(jax.random.key(0), n_blocks)
        return df.flow_chain(
            *[df.coupling_block(d, None, n=n_cond, key=k,
                                hidden_dim_s=hidden, hidden_dim_t=hidden,
                                joint_conditioner=joint) for k in keys],
            df.normalization_layer(x_ref, -1.0, 1.0),
        )

    def mlp_flops(model):
        from densityflows_tpu.ops.mlp import MLP

        nodes = jax.tree_util.tree_flatten(
            model, is_leaf=lambda n: isinstance(n, MLP))[0]
        return sum(2 * int(np.prod(w.shape))
                   for n in nodes if isinstance(n, MLP) for w in n.weights)

    def timed(fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        return time.perf_counter() - t0, out

    n_draws = 1 << 18
    peak = 197e12  # v5e bf16

    for batch in BATCHES:
        x = jnp.asarray(rng.normal(size=(batch, d)).astype(np.float32))
        theta = jnp.asarray(
            rng.uniform(0, 1, size=(batch, n_cond)).astype(np.float32))
        mask = jnp.ones((batch,), jnp.float32)
        theta_s = jnp.broadcast_to(theta[:1], (n_draws, n_cond))

        variants = {}
        for tag, joint, mp in (
            ("split_mp", False, True),
            ("joint_mp", True, True),
            ("split_f32", False, False),
            ("joint_f32", True, False),
        ):
            optimizer = optax.adam(1e-3)
            step = make_train_step(optimizer, mixed_precision=mp)
            model = build(joint)
            opt_state = optimizer.init(model)

            def make_scan(k, step=step):
                @jax.jit
                def run(model, opt_state):
                    def body(c, _):
                        m, o = c
                        m, o, loss = step(m, o, base, x, theta, mask)
                        return (m, o), loss

                    (m, o), losses = jax.lax.scan(
                        body, (model, opt_state), None, length=k)
                    return m, o, losses[-1]

                return run

            def make_sample(m_reps):
                @jax.jit
                def run(model, key):
                    def body(c, k):
                        r = base.sample(k, (n_draws,))
                        out = _sample_program(model, None, r, theta_s)
                        return c + jnp.sum(out), None

                    tot, _ = jax.lax.scan(
                        body, jnp.float32(0), jax.random.split(key, m_reps))
                    return tot

                return run

            v = dict(t1=make_scan(K1), t2=make_scan(K2),
                     s1=make_sample(M1), s2=make_sample(M2),
                     model=model, opt=opt_state, dt=[], ds=[],
                     flops=mlp_flops(model))
            jax.block_until_ready(v["t1"](model, opt_state))
            jax.block_until_ready(v["t2"](model, opt_state))
            jax.block_until_ready(v["s1"](model, jax.random.key(1)))
            jax.block_until_ready(v["s2"](model, jax.random.key(1)))
            variants[tag] = v

        for i in range(ROUNDS):
            for v in variants.values():
                e1, _ = timed(v["t1"], v["model"], v["opt"])
                e2, out = timed(v["t2"], v["model"], v["opt"])
                v["model"], v["opt"], _ = out
                v["dt"].append((e2 - e1) / (K2 - K1))
                e1, _ = timed(v["s1"], v["model"], jax.random.key(i))
                e2, _ = timed(v["s2"], v["model"], jax.random.key(i))
                v["ds"].append((e2 - e1) / (M2 - M1))

        for tag, v in variants.items():
            step_t = float(np.median(v["dt"]))
            samp_t = float(np.median(v["ds"]))
            sps = batch / step_t
            print(json.dumps({
                "variant": tag,
                "batch": batch,
                "train_samples_per_sec": round(sps, 1),
                "ms_per_step": round(step_t * 1e3, 3),
                "train_mfu": round(sps * 3 * v["flops"] / peak, 4),
                "flops_per_sample_fwd": v["flops"],
                "sample_draws_per_sec": round(n_draws / samp_t, 1),
            }))


if __name__ == "__main__":
    main()
