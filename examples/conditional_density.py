"""Worked example: 5-D conditional density estimation (docs/example.md).

Run: python examples/conditional_density.py
"""

import numpy as np
import jax

import densityflows_tpu as df


def simulate(theta, n, rng):
    x1 = rng.normal(size=n)
    eps = lambda: rng.normal(size=n)
    x2 = np.sin(x1 / 0.8) + 0.3 * eps() + theta
    x3 = np.exp(x1 / 1.4) / 10 + 0.1 * theta * eps() - 0.1 * theta
    x4 = np.cos(x1 / 1.1) + 0.3 * eps() + theta
    x5 = rng.normal(size=n)
    return np.stack([x1, x2, x3, x4, x5], axis=1).astype(np.float32)


def main():
    rng = np.random.default_rng(0)
    x = np.concatenate([simulate(-1.0, 2000, rng), simulate(2.0, 2000, rng)])
    theta = np.concatenate(
        [np.full((2000, 1), -1.0), np.full((2000, 1), 2.0)]
    ).astype(np.float32)
    data = df.DataArrays.make(x, theta, rng=0)

    ks = jax.random.split(jax.random.key(0), 3)
    chain = df.flow_chain(
        df.coupling_layer(data, [0, 1, 2], hidden_dim_s=16, hidden_dim_t=16, key=ks[0]),
        df.coupling_layer(data, [2, 3, 4], hidden_dim_s=16, hidden_dim_t=16, key=ks[1]),
        df.coupling_layer(data, [4, 0, 1], hidden_dim_s=16, hidden_dim_t=16, key=ks[2]),
        df.normalization_layer(x, -1.0, 1.0),
    )
    flow = df.Flow(chain, data)
    df.train(flow, data, epochs=50, verbose=False, key=jax.random.key(1))
    print(f"final NLL: train {flow.training_loss[-1]:.3f} "
          f"valid {flow.validation_loss[-1]:.3f}")

    s = np.asarray(flow.sample((50_000,), (-1.0,), key=jax.random.key(2)))
    ref = x[theta[:, 0] == -1.0]
    print("dim |  data mean  model mean |  data std  model std")
    for i in range(5):
        print(f"  {i} | {ref[:, i].mean():+10.3f} {s[:, i].mean():+10.3f} "
              f"| {ref[:, i].std():9.3f} {s[:, i].std():9.3f}")


if __name__ == "__main__":
    main()
