"""Fused-train kernel vs jnp program across the kernel's ENVELOPE (TPU).

The reference config showed 10.3× (benchmarks/fused_train_probe.py) —
this probe checks the auto-route is justified across the rest of the
supported envelope: wider conditioners, bigger d, bigger batches, more
rows, joint conditioners. Same raw-program interleaved two-point method
(`bench.measure_train_paths`). If some supported config LOSES to jnp,
the routing policy (train.py fused_kernel='auto') needs a size gate —
record either way in docs/design.md §12.

Run on the TPU: ``python benchmarks/fused_train_crossover.py``.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, rows, d, n_cond, hidden, n_layers, batch, joint)
CONFIGS = [
    ("reference", 1000, 5, 1, 16, 3, 64, False),
    ("wide_h64", 1000, 5, 1, 64, 3, 64, False),
    ("joint_d16_h64_b128", 1200, 16, 2, 64, 4, 128, True),
    ("d5_h16_b512", 1000, 5, 1, 16, 3, 512, False),
    # guard-rejected (reported, not measured): their Mosaic compiles
    # fail with scoped-VMEM stack OOM — verified r4
    ("d16_h64_b256", 4000, 16, 2, 64, 4, 256, False),
    ("big_batch_1024", 8000, 8, 2, 32, 4, 1024, False),
]


def main():
    import jax

    import bench
    import densityflows_tpu as df

    jax.numpy.zeros(8).block_until_ready()
    print("grant OK", flush=True)

    results = {}
    for (name, rows, d, n_cond, hidden, n_layers, batch, joint) in CONFIGS:
        rng = np.random.default_rng(0)
        x = rng.normal(size=(rows, d)).astype(np.float32)
        th = rng.uniform(0, 1, size=(rows, n_cond)).astype(np.float32)
        data = df.DataArrays.make(x, th, rng=0)
        ks = jax.random.split(jax.random.key(0), n_layers)
        layers = [
            df.coupling_layer(
                data, [(j + i) % d for i in range(d // 2)],
                hidden_dim_s=hidden, hidden_dim_t=hidden, key=k,
                joint_conditioner=joint)
            for j, k in enumerate(ks)
        ]
        flow = df.Flow(df.flow_chain(*layers,
                                     df.normalization_layer(x, -1.0, 1.0)),
                       data)
        n_train = len(data.partition.training)
        nv = len(data.partition.validation)

        # the same envelope guard train() applies — measure_train_paths
        # calls run_fused_train directly and would otherwise hit a raw
        # Mosaic scoped-VMEM compile failure (verified r4: every config
        # the guard rejects also fails to compile, and vice versa)
        from densityflows_tpu.models.fused_train import (
            UnsupportedFusedTrain,
            _check_budget,
            chain_train_fold,
        )

        try:
            plan, _tc, tparams, _m, _ms, cparams, _f, _u = \
                chain_train_fold(flow.model)
            _check_budget(plan, tparams, cparams, n_train, nv, d, n_cond,
                          batch, 1000)
        except UnsupportedFusedTrain as e:
            print(f"{name}: guard-rejected ({e}) — train() auto-routes "
                  "this to the jnp program", flush=True)
            continue

        # scale the epoch gaps so HI stays ~0.2-2 s of device work
        lo = 10
        hi = max(60, min(510, int(500 * 64000 / (n_train * hidden))))
        try:
            sps_j, sps_f, det = bench.measure_train_paths(
                jax, df, flow, data, lo=lo, hi=lo + hi, reps=7,
                batchsize=batch)
        except Exception as e:  # timing failure
            print(f"{name}: SKIP ({type(e).__name__}: {e})", flush=True)
            continue
        results[name] = {
            "jnp_sps": sps_j, "fused_sps": sps_f,
            "speedup": sps_f / sps_j,
            "jnp_us_per_epoch": det["jnp_us_per_epoch"],
            "fused_us_per_epoch": det["fused_us_per_epoch"],
        }
        print(f"{name}: jnp {sps_j/1e6:.2f}M fused {sps_f/1e6:.2f}M "
              f"-> {sps_f/sps_j:.2f}x", flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
