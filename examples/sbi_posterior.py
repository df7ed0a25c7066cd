"""Worked example: simulation-based inference (SNPE) + SMC cross-check.

Fits an amortized posterior q(θ | x) for a toy simulator with a spline
flow, then cross-checks the posterior at one observation against a
tempered-SMC run on the analytic unnormalized posterior.

Run: python examples/sbi_posterior.py
"""

import numpy as np
import jax
import jax.numpy as jnp

import densityflows_tpu as df

SIGMA = 0.2


def main():
    rng = np.random.default_rng(0)
    n_sims = 5000
    theta = rng.uniform(-1.0, 1.0, size=(n_sims, 1)).astype(np.float32)
    x = (np.sin(2 * theta) + SIGMA * rng.normal(size=(n_sims, 1))).astype(np.float32)

    # amortized posterior: flow over θ conditioned on x
    chain = df.flow_chain(
        df.coupling_layer(1, [0], n=1, kind=df.RQSCouplingLayer,
                          key=jax.random.key(0), hidden_dim_t=32, n_bins=8),
    )
    flow = df.Flow(chain, df.MetaData("", 1, 1, x.min(0), x.max(0)))
    df.fit_posterior(flow, theta, x, epochs=60, key=jax.random.key(1))

    x_obs = 0.5
    post = np.asarray(flow.sample((20_000,), (x_obs,), key=jax.random.key(2)))
    print(f"SNPE posterior at x={x_obs}: mean {post.mean():+.3f} "
          f"std {post.std():.3f}")

    # same fit with the atomic SNPE-C/APT objective (proposal-robust,
    # no importance weights): prior is Uniform(-1, 1) → log p = -log 2
    chain_apt = df.flow_chain(
        df.coupling_layer(1, [0], n=1, kind=df.RQSCouplingLayer,
                          key=jax.random.key(5), hidden_dim_t=32, n_bins=8),
    )
    flow_apt = df.Flow(chain_apt, df.MetaData("", 1, 1, x.min(0), x.max(0)))
    df.fit_posterior_apt(
        flow_apt, theta, x,
        lambda t: np.full(len(t), -np.log(2.0)),
        n_atoms=10, epochs=60, batchsize=128, key=jax.random.key(6),
    )
    post_apt = np.asarray(
        flow_apt.sample((20_000,), (x_obs,), key=jax.random.key(7)))
    print(f"APT  posterior at x={x_obs}: mean {post_apt.mean():+.3f} "
          f"std {post_apt.std():.3f}")

    # SMC on the analytic unnormalized posterior p(θ|x) ∝ p(x|θ)·1[|θ|≤1]
    def log_post(th):
        ll = -0.5 * jnp.sum((x_obs - jnp.sin(2 * th)) ** 2, -1) / SIGMA**2
        inside = jnp.all(jnp.abs(th) <= 1.0, axis=-1)
        return jnp.where(inside, ll, -1e9)

    particles, log_w, diag = df.run_smc(
        log_post, d=1, n_particles=8192, n_steps=20,
        init_scale=1.0, mh_step_size=0.2, n_mh=3, key=jax.random.key(3),
    )
    w = np.exp(np.asarray(log_w) - np.asarray(log_w).max())
    w /= w.sum()
    p = np.asarray(particles)[:, 0]
    mean = (p * w).sum()
    std = np.sqrt(((p - mean) ** 2 * w).sum())
    print(f"SMC  posterior at x={x_obs}: mean {mean:+.3f} std {std:.3f}")


if __name__ == "__main__":
    main()
