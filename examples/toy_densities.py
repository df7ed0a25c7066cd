"""2-D toy densities: unconditional 8-layer coupling stacks.

BASELINE.json config 2 — the density-matching sanity check. Trains an
8-coupling-layer stack (4 complementary blocks) on two-moons with affine
(RealNVP) couplings and on concentric rings with rational-quadratic
spline couplings (affine stacks can't cut the ring topology — measured
~50% manifold coverage vs ~89% for RQS), then reports NLL, the fraction
of generated samples within 3σ of the true manifold, and the
data-vs-background log-prob contrast.

Run: ``python examples/toy_densities.py [--dataset moons|rings|both]``
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import optax

import densityflows_tpu as df
from densityflows_tpu.utils.datasets import (
    moons_manifold_distance,
    rings,
    rings_manifold_distance,
    two_moons,
)


def run(name: str, epochs: int):
    if name == "moons":
        noise = 0.1
        x = two_moons(4000, noise=noise, rng=0)
        kind, dist = df.RNVPCouplingLayer, moons_manifold_distance
    else:
        noise = 0.08
        x = rings(4000, noise=noise, rng=0)
        kind, dist = df.RQSCouplingLayer, rings_manifold_distance

    data = df.DataArrays.make(x, rng=0)
    ks = jax.random.split(jax.random.key(0), 4)
    blocks = [
        df.coupling_block(2, [0], kind=kind, key=k,
                          hidden_dim_s=48, hidden_dim_t=48)
        for k in ks
    ]
    chain = df.flow_chain(*blocks, df.normalization_layer(x, -1.0, 1.0))
    flow = df.Flow(chain, data)
    df.train(flow, data, optax.adam(2e-3), epochs=epochs, batchsize=256,
             verbose=False, key=jax.random.key(1))

    s = np.asarray(flow.sample((4000,), key=jax.random.key(2)))
    cover = float(np.mean(dist(s) < 3 * noise))
    lo, hi = x.min(0), x.max(0)
    bg = np.random.default_rng(3).uniform(
        lo, hi, size=(2000, 2)).astype(np.float32)
    lp_data = float(np.mean(np.asarray(flow.log_prob(x[:1000]))))
    lp_bg = float(np.mean(np.asarray(flow.log_prob(bg))))
    print(
        f"{name:6s} [{kind.__name__}]  "
        f"train NLL {flow.train_loss[-1]:.3f} | valid NLL "
        f"{flow.valid_loss[-1]:.3f} | {cover:.1%} of samples within "
        f"3σ of the manifold | log p: data {lp_data:.2f} vs "
        f"background {lp_bg:.2f}"
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["moons", "rings", "both"],
                    default="both")
    ap.add_argument("--epochs", type=int, default=60)
    args = ap.parse_args()
    for name in (["moons", "rings"] if args.dataset == "both"
                 else [args.dataset]):
        run(name, args.epochs)
