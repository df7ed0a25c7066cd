"""Per-step fused-grads kernel probe (VERDICT r4 item 4, mesh-DP leg).

Compares, per training step (interleaved two-point scan timing):

- A: the jnp train step (`train.make_train_step` — jax.grad + optax
  Adam, the step the GSPMD mesh path scans today), vs
- B: the fused-grads kernel step (`ops/pallas_step.run_fused_grads` on
  folded params + optax Adam on the folded list) — the step shape that
  composes with shard_map DP (local kernel -> grad psum -> update).

Both steps do identical math; only the sequencing differs. If B wins at
the launch-bound configs (small/medium), wiring shard_map DP through it
is worth it; if XLA wins (as it did for the per-layer kernels), the
postmortem goes to design.md and the mesh path stays jnp.

Run on the TPU:
    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/step_kernel_probe.py
"""

import json
import time

import numpy as np

CONFIGS = [
    # m2 sized so gap x per-step time >= ~150 ms of device signal (the
    # two-point sizing rule; a 56-step gap at ~40 us/step once measured
    # negative rates through tunnel jitter)
    dict(name="ref", d=5, n=1, hidden=16, batch=64, m2=4096),
    dict(name="med", d=16, n=4, hidden=64, batch=1024, m2=2048),
    dict(name="wide", d=32, n=8, hidden=256, batch=8192, m2=256),
]


def _timed(fn, *a):
    import jax

    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a))
    return time.perf_counter() - t0


def measure(cfg, m1=8, m2=None, reps=5):
    import jax
    import jax.numpy as jnp
    import optax

    import densityflows_tpu as df
    from densityflows_tpu.models.fused_train import chain_train_fold
    from densityflows_tpu.ops.pallas_step import run_fused_grads
    from densityflows_tpu.train import make_train_step

    d, n_cond, hidden, batch = cfg["d"], cfg["n"], cfg["hidden"], cfg["batch"]
    if m2 is None:
        m2 = cfg.get("m2", 2048)
    rng = np.random.default_rng(0)
    x_ref = rng.normal(size=(256, d)).astype(np.float32)
    ks = jax.random.split(jax.random.key(0), 3)
    chain = df.flow_chain(
        df.coupling_layer(d, list(range(d // 2)), n=n_cond, key=ks[0],
                          hidden_dim_s=hidden, hidden_dim_t=hidden),
        df.coupling_layer(d, list(range(d // 2, d)), n=n_cond, key=ks[1],
                          hidden_dim_s=hidden, hidden_dim_t=hidden),
        df.coupling_layer(d, list(range(d // 2)), n=n_cond, key=ks[2],
                          hidden_dim_s=hidden, hidden_dim_t=hidden),
        df.normalization_layer(x_ref, -1.0, 1.0),
    )
    base = df.StandardNormal(d)
    optimizer = optax.adam(1e-3)
    x = jnp.asarray(rng.normal(size=(batch, d)).astype(np.float32))
    th = jnp.asarray(
        rng.uniform(0, 1, size=(batch, n_cond)).astype(np.float32))
    mask = jnp.ones((batch,), jnp.float32)

    # --- A: jnp step --------------------------------------------------------
    step = make_train_step(optimizer)

    def make_jnp_scan(m):
        @jax.jit
        def run(model, opt):
            def body(c, _):
                mm, oo = c
                mm, oo, loss = step(mm, oo, base, x, th, mask)
                return (mm, oo), loss

            (mm, oo), losses = jax.lax.scan(body, (model, opt), None,
                                            length=m)
            return losses[-1]

        return run

    # --- B: fused-grads kernel step ----------------------------------------
    (plan, tcounts, tparams, masks, mask_slots, cparams, _fs,
     _uf) = chain_train_fold(chain)
    tile = min(batch, 512)

    def make_kernel_scan(m):
        @jax.jit
        def run(tp, opt):
            def body(c, _):
                tp, oo = c
                loss, grads = run_fused_grads(
                    x, th, mask, tuple(tp), tuple(masks), tuple(cparams),
                    plan=plan, tcounts=tuple(tcounts),
                    mask_slots=tuple(mask_slots), tile=tile)
                upd, oo = optimizer.update(grads, oo, list(tp))
                tp = [p + u for p, u in zip(tp, upd)]
                return (tp, oo), loss

            (tp, oo), losses = jax.lax.scan(body, (list(tp), opt), None,
                                            length=m)
            return losses[-1]

        return run

    progs = {
        "jnp": (make_jnp_scan(m1), make_jnp_scan(m2),
                (chain, optimizer.init(chain))),
        "kernel": (make_kernel_scan(m1), make_kernel_scan(m2),
                   (list(tparams), optimizer.init(list(tparams)))),
    }
    out = {"config": cfg["name"], **{k: cfg[k] for k in
                                     ("d", "n", "hidden", "batch")}}
    for _ in range(3):
        for lo, hi, a in progs.values():  # compile
            _timed(lo, *a), _timed(hi, *a)
        us = {name: [] for name in progs}
        for _ in range(reps):
            for name, (lo, hi, a) in progs.items():  # interleaved
                t_lo = _timed(lo, *a)
                t_hi = _timed(hi, *a)
                us[name].append((t_hi - t_lo) / (m2 - m1) * 1e6)
        meds = {name: float(np.median(v)) for name, v in us.items()}
        if all(m > 0 for m in meds.values()):
            break
        m1, m2 = m1, m1 + 2 * (m2 - m1)  # jitter-dominated: widen
        progs = {
            "jnp": (make_jnp_scan(m1), make_jnp_scan(m2),
                    (chain, optimizer.init(chain))),
            "kernel": (make_kernel_scan(m1), make_kernel_scan(m2),
                       (list(tparams), optimizer.init(list(tparams)))),
        }
    for name, med in meds.items():
        out[f"{name}_us_per_step"] = round(med, 2)
    out["kernel_speedup"] = round(
        out["jnp_us_per_step"] / out["kernel_us_per_step"], 2)
    return out


def main():
    rows = []
    for cfg in CONFIGS:
        r = measure(cfg)
        print(json.dumps(r), flush=True)
        rows.append(r)
    print(json.dumps({"table": rows}))


if __name__ == "__main__":
    main()
