"""Multi-round SNPE (fit_posterior_rounds) on a conjugate-Gaussian toy."""

import numpy as np
import jax

import densityflows_tpu as df

SIGMA = 0.5


def test_multiround_snpe_recovers_conjugate_posterior():
    # θ ~ N(0,1);  x|θ ~ N(θ, σ²);  observe x_obs
    # => posterior N(x_obs/(1+σ²), σ²/(1+σ²))
    x_obs = 1.0
    post_mean = x_obs / (1 + SIGMA**2)          # 0.8
    post_std = np.sqrt(SIGMA**2 / (1 + SIGMA**2))  # 0.447

    sim_rng = np.random.default_rng(0)

    def simulator(theta):
        return theta + SIGMA * sim_rng.normal(size=theta.shape)

    def prior_sample(rng, n):
        return rng.normal(size=(n, 1))

    def prior_log_prob(theta):
        t = np.asarray(theta)[:, 0]
        return -0.5 * t**2 - 0.5 * np.log(2 * np.pi)

    flow = df.Flow(
        df.flow_chain(
            df.coupling_layer(1, [0], n=1, kind=df.RQSCouplingLayer,
                              key=jax.random.key(0), n_bins=8,
                              hidden_dim_t=32),
        ),
        df.MetaData("", 1, 1, np.array([-4.0], np.float32),
                    np.array([4.0], np.float32)),
    )
    flow, history = df.fit_posterior_rounds(
        flow, simulator, prior_sample, prior_log_prob, [x_obs],
        n_rounds=3, n_sims_per_round=800, epochs=40,
        key=jax.random.key(1), rng=np.random.default_rng(2),
    )
    assert len(history) == 3
    assert history[-1]["n_sims"] == 3 * 800
    assert all(np.isfinite(h["weight_ess"]) and h["weight_ess"] > 1
               for h in history)

    draws = np.asarray(
        flow.sample((20_000,), (x_obs,), key=jax.random.key(3))
    )[:, 0]
    assert abs(draws.mean() - post_mean) < 0.12
    assert abs(draws.std() - post_std) < 0.12


def test_multiround_snpe_validates_simulator():
    def bad_simulator(theta):
        return theta[: len(theta) // 2]

    flow = df.Flow(
        df.flow_chain(df.coupling_layer(1, [0], n=1, key=jax.random.key(0))),
        df.MetaData("", 1, 1, np.array([-4.0], np.float32),
                    np.array([4.0], np.float32)),
    )
    import pytest

    with pytest.raises(ValueError):
        df.fit_posterior_rounds(
            flow, bad_simulator,
            lambda rng, n: rng.normal(size=(n, 1)),
            lambda t: np.zeros(len(t)),
            [0.0], n_rounds=1, n_sims_per_round=64, epochs=1,
        )


def test_mixture_proposal_density_removes_truncation_bias():
    """Prior-support rejection makes the true proposal the mixture
    q_flow + ε·prior; weights from that mixture must be unbiased where the
    naive q_flow-only density is badly biased (VERDICT r2 item 5).

    Setup: known 'flow' q_flow = N(0.9, 0.4) on 1-D, prior Uniform(0,1)
    (≈41% of flow draws land outside the support and get replaced). Target
    the prior itself: self-normalized importance estimate of E[θ] under
    w = prior/q̃ must hit 0.5.
    """
    from densityflows_tpu.inference import propose_from_posterior

    m, s = 0.9, 0.4

    class FakeFlow:
        def sample(self, dims, cond, *, key):
            return m + s * np.asarray(jax.random.normal(key, (dims[0], 1)))

        def log_prob(self, theta, cond):
            t = np.asarray(theta)[:, 0]
            return -0.5 * ((t - m) / s) ** 2 - np.log(s * np.sqrt(2 * np.pi))

    def prior_sample(rng, n):
        return rng.uniform(0, 1, size=(n, 1))

    def prior_log_prob(th):
        t = np.asarray(th)[:, 0]
        return np.where((t >= 0) & (t <= 1), 0.0, -np.inf)

    flow = FakeFlow()
    theta, log_q = propose_from_posterior(
        flow, [0.0], 50_000, prior_sample, prior_log_prob,
        np.random.default_rng(0), jax.random.key(0),
    )
    t = theta[:, 0]
    assert ((t >= 0) & (t <= 1)).all()  # every row in support
    lp = prior_log_prob(theta)

    w_corrected = np.exp(lp - log_q)
    est_corrected = np.sum(w_corrected * t) / np.sum(w_corrected)

    w_naive = np.exp(lp - flow.log_prob(theta, None))  # the old formula
    est_naive = np.sum(w_naive * t) / np.sum(w_naive)

    assert abs(est_corrected - 0.5) < 0.02, est_corrected
    assert abs(est_naive - 0.5) > 0.08, est_naive  # the bias being fixed


def test_apt_recovers_conjugate_posterior():
    """SNPE-C / APT (atomic contrastive loss): same conjugate-Gaussian
    setup as the SNPE-B test; the atomic objective must recover the
    analytic posterior from prior-drawn simulations without importance
    weights."""
    x_obs = 1.0
    post_mean = x_obs / (1 + SIGMA**2)
    post_std = np.sqrt(SIGMA**2 / (1 + SIGMA**2))

    rng = np.random.default_rng(0)
    n = 2000
    theta = rng.normal(size=(n, 1)).astype(np.float32)
    x = (theta + SIGMA * rng.normal(size=theta.shape)).astype(np.float32)

    def prior_log_prob(t):
        t = np.asarray(t)[:, 0]
        return -0.5 * t**2 - 0.5 * np.log(2 * np.pi)

    flow = df.Flow(
        df.flow_chain(
            df.coupling_layer(1, [0], n=1, kind=df.RQSCouplingLayer,
                              key=jax.random.key(0), n_bins=8,
                              hidden_dim_t=32),
        ),
        df.MetaData("", 1, 1, np.array([-4.0], np.float32),
                    np.array([4.0], np.float32)),
    )
    df.fit_posterior_apt(flow, theta, x, prior_log_prob, n_atoms=10,
                         epochs=100, batchsize=128, key=jax.random.key(1))
    assert np.isfinite(flow.train_loss).all()
    # atomic loss is bounded by log(n_atoms); a trained flow sits well below
    assert flow.train_loss[-1] < np.log(10)

    draws = np.asarray(
        flow.sample((20_000,), (x_obs,), key=jax.random.key(3))
    )[:, 0]
    assert abs(draws.mean() - post_mean) < 0.12, draws.mean()
    assert abs(draws.std() - post_std) < 0.12, draws.std()


def test_apt_program_cached():
    from densityflows_tpu import inference as inf
    import optax

    rng = np.random.default_rng(1)
    theta = rng.normal(size=(256, 1)).astype(np.float32)
    x = (theta + 0.3 * rng.normal(size=theta.shape)).astype(np.float32)

    def build():
        return df.Flow(
            df.flow_chain(df.coupling_layer(1, [0], n=1,
                                            key=jax.random.key(0))),
            df.MetaData("", 1, 1, np.array([-4.0], np.float32),
                        np.array([4.0], np.float32)),
        )

    opt = optax.adam(1e-3)
    inf.trace_counts.pop("apt", None)
    df.fit_posterior_apt(build(), theta, x, n_atoms=4, epochs=2,
                         batchsize=64, optimizer=opt,
                         key=jax.random.key(1))
    df.fit_posterior_apt(build(), theta, x, n_atoms=4, epochs=2,
                         batchsize=64, optimizer=opt,
                         key=jax.random.key(2))
    assert inf.trace_counts["apt"] == 1


def test_multiround_apt_recovers_conjugate_posterior():
    """Sequential APT (method='apt'): same conjugate target as the SNPE-B
    multi-round test, no importance weights anywhere."""
    x_obs = 1.0
    post_mean = x_obs / (1 + SIGMA**2)
    post_std = np.sqrt(SIGMA**2 / (1 + SIGMA**2))

    sim_rng = np.random.default_rng(0)

    def simulator(theta):
        return theta + SIGMA * sim_rng.normal(size=theta.shape)

    def prior_sample(rng, n):
        return rng.normal(size=(n, 1))

    def prior_log_prob(theta):
        t = np.asarray(theta)[:, 0]
        return -0.5 * t**2 - 0.5 * np.log(2 * np.pi)

    flow = df.Flow(
        df.flow_chain(
            df.coupling_layer(1, [0], n=1, kind=df.RQSCouplingLayer,
                              key=jax.random.key(0), n_bins=8,
                              hidden_dim_t=32),
        ),
        df.MetaData("", 1, 1, np.array([-4.0], np.float32),
                    np.array([4.0], np.float32)),
    )
    flow, history = df.fit_posterior_rounds(
        flow, simulator, prior_sample, prior_log_prob, [x_obs],
        n_rounds=2, n_sims_per_round=800, epochs=50, method="apt",
        n_atoms=10, key=jax.random.key(1), rng=np.random.default_rng(2),
    )
    assert [h["weight_ess"] for h in history] == [None, None]

    draws = np.asarray(
        flow.sample((20_000,), (x_obs,), key=jax.random.key(3))
    )[:, 0]
    assert abs(draws.mean() - post_mean) < 0.12, draws.mean()
    assert abs(draws.std() - post_std) < 0.12, draws.std()
