"""TP=2 vs replicated conditioners at the wide-emulator config.

Measures one fused train step (wide config: d=32, n=8, hidden 256,
4 coupling blocks, batch 8192) under

  (a) DP=8 replicated params              mesh (8,)   ("data",)
  (b) DP=4 x TP=2 Megatron conditioners   mesh (4, 2) ("data", "model")

with the two-point scanned method (Δt/ΔM over lax.scan lengths 2/8 —
the only timing that survives the tunnel, docs/design.md §3).

Runs on the 8-virtual-device CPU rig by default (the real deployment has
one tunneled chip, so multi-chip numbers are necessarily CPU-mesh
proxies — collective CALLS are real, ICI latencies are not; stated as
such in README §Performance). Usage:

    python benchmarks/tp_probe.py
"""

import time

import numpy as np


def main():
    import os

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    import densityflows_tpu as df
    from densityflows_tpu.parallel.mesh import (
        data_sharding, make_mesh, replicated, shard_params_tp,
    )
    from densityflows_tpu.train import masked_nll_loss

    d, n_cond, hidden, n_blocks, batch = 32, 8, 256, 4, 8192
    rng = np.random.default_rng(0)
    keys = jax.random.split(jax.random.key(0), n_blocks)
    chain = df.flow_chain(
        *[df.coupling_block(d, None, n=n_cond, key=k,
                            hidden_dim_s=hidden, hidden_dim_t=hidden)
          for k in keys],
    )
    base = df.StandardNormal(d)
    optimizer = optax.adam(1e-3)
    x_np = rng.normal(size=(batch, d)).astype(np.float32)
    th_np = rng.uniform(0, 1, size=(batch, n_cond)).astype(np.float32)

    def measure(mesh, place_params):
        model = place_params(chain)
        opt_state = jax.tree_util.tree_map(
            lambda l: l, optimizer.init(model))
        x = jax.device_put(x_np, data_sharding(mesh, 2))
        th = jax.device_put(th_np, data_sharding(mesh, 2))
        mask = jax.device_put(np.ones((batch,), np.float32),
                              data_sharding(mesh, 1))

        def make(m):
            @jax.jit
            def run(model, opt_state):
                def body(c, _):
                    mm, oo = c
                    loss, grads = jax.value_and_grad(masked_nll_loss)(
                        mm, base, x, th, mask)
                    updates, oo = optimizer.update(grads, oo, mm)
                    mm = optax.apply_updates(mm, updates)
                    return (mm, oo), loss

                _, losses = jax.lax.scan(body, (model, opt_state), None,
                                         length=m)
                return losses[-1]

            return run

        f1, f2 = make(2), make(8)
        l1 = f1(model, opt_state)
        l2 = f2(model, opt_state)
        jax.block_until_ready((l1, l2))
        ds = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f1(model, opt_state))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(f2(model, opt_state))
            t2 = time.perf_counter() - t0
            ds.append((t2 - t1) / 6)
        return float(np.median(ds)) * 1e3, float(np.asarray(l2))

    mesh_dp = make_mesh((8,), ("data",))
    ms_dp, loss_dp = measure(
        mesh_dp, lambda m: jax.device_put(m, replicated(mesh_dp)))

    mesh_2d = make_mesh((4, 2), ("data", "model"))
    ms_tp, loss_tp = measure(
        mesh_2d, lambda m: shard_params_tp(mesh_2d, m))

    assert abs(loss_dp - loss_tp) < 1e-3, (loss_dp, loss_tp)
    print(f"wide train step  DP=8 replicated : {ms_dp:8.2f} ms")
    print(f"wide train step  DP=4 x TP=2     : {ms_tp:8.2f} ms")
    print(f"TP/replicated ratio: {ms_tp / ms_dp:.2f}x "
          f"({'TP wins' if ms_tp < ms_dp else 'replicated wins'}) "
          f"[8-virtual-device CPU mesh proxy; losses match to 1e-3]")


if __name__ == "__main__":
    main()
