"""Reference 5-D conditional config benchmark (the headline metric).

Same workload as the driver's `bench.py` but with per-phase JSON lines:
fused 50-epoch training run, per-epoch eval cost included, and the
donated-buffer sampling sweep at several draw counts.
"""

import copy
import json
import os
import time

import numpy as np


def main():
    import jax

    import densityflows_tpu as df
    from densityflows_tpu.models.flow import _sample_program

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
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
    epochs = 50
    n_train = len(data.partition.training)

    warm = df.Flow(copy.deepcopy(chain), data)
    df.train(warm, data, epochs=epochs, verbose=False, key=jax.random.key(1))
    flow = df.Flow(chain, data)
    t0 = time.perf_counter()
    df.train(flow, data, epochs=epochs, verbose=False, key=jax.random.key(2))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "variant": "train_50_epochs",
        "samples_per_sec_per_chip": round(epochs * n_train / dt, 1),
        "final_train_nll": round(float(flow.train_loss[-1]), 4),
        "final_valid_nll": round(float(flow.valid_loss[-1]), 4),
    }))

    for log2_draws in (16, 18, 20):
        n_draws = 1 << log2_draws
        theta_n = flow.prepare_theta((-1.0,), (n_draws,))
        r = flow.base.sample(jax.random.key(3), (n_draws,))
        _sample_program(flow.model, None, r, theta_n).block_until_ready()
        reps = 20
        t0 = time.perf_counter()
        for i in range(reps):
            out = _sample_program(
                flow.model, None,
                flow.base.sample(jax.random.key(10 + i), (n_draws,)), theta_n,
            )
        np.asarray(out[0, 0])
        dps = reps * n_draws / (time.perf_counter() - t0)
        print(json.dumps({
            "variant": f"sample_2^{log2_draws}",
            "draws_per_sec": round(dps, 1),
        }))


if __name__ == "__main__":
    main()
