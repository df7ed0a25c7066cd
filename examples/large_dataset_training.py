"""Worked example: training at dataset scale with kernel-path visibility.

Round 5 removed the fused-kernel envelope cliff: long runs chunk through
the whole-run kernel, large datasets stream through the per-batch
kernel, and every `train()` call records which path it ran. This example
trains a conditional flow on 60k rows — far past the resident kernel's
~10-15k-row envelope — and inspects the routing attributes.

On a TPU the streaming kernel sustains ~13-14M samples/s regardless of
row count (7.7x the jnp program at this size — design.md SS14c); on CPU
everything runs the jnp program and the attributes say so.

Run: python examples/large_dataset_training.py
"""

import numpy as np
import jax

import densityflows_tpu as df


def simulate(n, rng):
    theta = rng.uniform(-1.0, 2.0, size=(n, 1)).astype(np.float32)
    x1 = rng.normal(size=n)
    x2 = np.sin(x1 / 0.8) + 0.3 * rng.normal(size=n) + theta[:, 0]
    x3 = np.cos(x1 / 1.1) + 0.3 * rng.normal(size=n) - 0.2 * theta[:, 0]
    x = np.stack([x1, x2, x3], axis=1).astype(np.float32)
    return x, theta


def main():
    rng = np.random.default_rng(0)
    x, theta = simulate(60_000, rng)
    data = df.DataArrays.make(x, theta, rng=0)

    ks = jax.random.split(jax.random.key(0), 2)
    chain = df.flow_chain(
        df.coupling_layer(data, [0, 1], hidden_dim_s=16, hidden_dim_t=16,
                          key=ks[0]),
        df.coupling_layer(data, [1, 2], hidden_dim_s=16, hidden_dim_t=16,
                          key=ks[1]),
        df.normalization_layer(x, -1.0, 1.0),
    )
    flow = df.Flow(chain, data)

    # verbose=True prints a one-line notice if the fused kernel declines
    # (and which envelope item blocked it)
    df.train(flow, data, df.adam(1e-3), epochs=3, batchsize=64,
             verbose=True, key=jax.random.key(1))

    print(f"trained_path      = {flow.trained_path}")
    print(f"fused_kernel_mode = {flow.fused_kernel_mode}")
    print(f"decline reason    = {flow.fused_decline_reason}")
    print(f"final valid NLL   = {flow.valid_loss[-1]:.3f}")

    s = flow.sample((10_000,), (0.5,), key=jax.random.key(2))
    print(f"10k conditional draws at theta=0.5: mean "
          f"{np.asarray(s).mean(0).round(3)}")


if __name__ == "__main__":
    main()
