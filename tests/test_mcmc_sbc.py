"""Flow-accelerated MCMC + simulation-based calibration tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import densityflows_tpu as df


def _identity_flow(d=2, n=0):
    """Zero-init couplings => model is the identity => flow == base."""
    chain = df.flow_chain(
        df.coupling_layer(d, list(range(d // 2)), n=n, key=jax.random.key(0)),
        df.coupling_layer(d, list(range(d // 2, d)), n=n, key=jax.random.key(1)),
    )
    md = df.MetaData("", d, n, np.zeros(n, np.float32), np.ones(n, np.float32))
    return df.Flow(chain, md)


def _target_logp(x):
    # N(mean=[1, -0.5], scale=[0.5, 0.8])
    mu = jnp.asarray([1.0, -0.5])
    sc = jnp.asarray([0.5, 0.8])
    u = (x - mu) / sc
    return -0.5 * jnp.sum(u * u, axis=-1)


@pytest.mark.parametrize("method", ["independence", "neutra"])
def test_flow_mcmc_recovers_target_moments(method):
    flow = _identity_flow()
    samples, diag = df.flow_mcmc(
        flow, _target_logp, n_chains=512, n_steps=600, burn_in=200,
        method=method, step_size=0.8, key=jax.random.key(2),
    )
    s = np.asarray(samples).reshape(-1, 2)
    assert samples.shape == (400, 512, 2)
    acc = np.asarray(diag["accept_rate"])
    assert acc.shape == (600,)
    assert 0.01 < acc.mean() < 1.0
    np.testing.assert_allclose(s.mean(0), [1.0, -0.5], atol=0.05)
    np.testing.assert_allclose(s.std(0), [0.5, 0.8], atol=0.05)


def test_flow_mcmc_validates_args():
    flow = _identity_flow()
    with pytest.raises(ValueError):
        df.flow_mcmc(flow, _target_logp, method="hamiltonian")
    with pytest.raises(ValueError):
        df.flow_mcmc(flow, _target_logp, n_steps=10, burn_in=10)


def test_sbc_uniform_when_posterior_exact():
    """Posterior == prior == q (x uninformative): ranks must be uniform."""
    flow = _identity_flow(d=2, n=3)
    rng = np.random.default_rng(0)
    n_sims, n_draws = 400, 127
    theta_true = rng.normal(size=(n_sims, 2)).astype(np.float32)
    x_obs = rng.uniform(size=(n_sims, 3)).astype(np.float32)
    ranks = np.asarray(
        df.sbc_ranks(flow, theta_true, x_obs, n_draws=n_draws,
                     key=jax.random.key(3))
    )
    assert ranks.shape == (n_sims, 2)
    assert ranks.min() >= 0 and ranks.max() <= n_draws
    ks = df.sbc_uniformity(ranks, n_draws)
    # 1% KS threshold ≈ 1.63/sqrt(400) ≈ 0.0815
    assert ks < 1.63 / np.sqrt(n_sims)


def test_sbc_flags_miscalibrated_posterior():
    """A posterior that is much too narrow must produce extreme ranks."""
    # identity flow with base scale 0.2 => q(θ|x) = N(0, 0.2²) but true
    # θ ~ N(0,1): ranks pile at the ends
    chain = df.flow_chain(
        df.coupling_layer(2, [0], n=1, key=jax.random.key(0)),
    )
    md = df.MetaData("", 2, 1, np.zeros(1, np.float32), np.ones(1, np.float32))
    base = df.DiagNormal(jnp.zeros(2), 0.2 * jnp.ones(2))
    flow = df.Flow(chain, md, base=base)
    rng = np.random.default_rng(1)
    theta_true = rng.normal(size=(300, 2)).astype(np.float32)
    x_obs = rng.uniform(size=(300, 1)).astype(np.float32)
    ranks = np.asarray(
        df.sbc_ranks(flow, theta_true, x_obs, n_draws=100,
                     key=jax.random.key(4))
    )
    ks = df.sbc_uniformity(ranks, 100)
    assert ks > 0.15  # grossly miscalibrated
    edge = ((ranks == 0) | (ranks == 100)).mean()
    assert edge > 0.3


def test_flow_mcmc_conditional_theta():
    """Conditioned identity flow: theta is passed through prepare_theta."""
    flow = _identity_flow(d=2, n=1)
    samples, diag = df.flow_mcmc(
        flow, _target_logp, theta=(0.5,), n_chains=64, n_steps=50,
        burn_in=10, key=jax.random.key(5),
    )
    assert samples.shape == (40, 64, 2)
    assert np.isfinite(np.asarray(samples)).all()


def test_flow_mcmc_reports_convergence_diagnostics():
    """A well-matched flow on a tractable Gaussian target mixes: R̂ ≈ 1
    and the combined ESS is a large fraction of the sample count."""
    flow = _identity_flow()
    samples, diag = df.flow_mcmc(
        flow, _target_logp, n_chains=256, n_steps=300, burn_in=100,
        method="independence", key=jax.random.key(6),
    )
    assert diag["r_hat"].shape == (2,)
    assert diag["ess"].shape == (2,)
    # IMH with a standard-normal proposal on this shifted target sticks
    # occasionally — R̂ lands ~1.02-1.03; well under the broken regime
    assert np.all(diag["r_hat"] < 1.05)
    assert np.all(diag["ess"] > 0.05 * 200 * 256)


def test_mcmc_diagnostics_flag_unmixed_chains():
    """Chains stuck in different modes: R̂ ≫ 1 and tiny ESS."""
    rng = np.random.default_rng(0)
    n, m, d = 200, 8, 2
    offsets = rng.normal(scale=5.0, size=(1, m, d))
    stuck = offsets + 0.1 * rng.normal(size=(n, m, d))
    diag = df.mcmc_diagnostics(stuck)
    assert np.all(diag["r_hat"] > 5.0)
    assert np.all(diag["ess"] < 0.2 * n * m)

    # and the same chains WITHOUT the offsets are fine
    ok = df.mcmc_diagnostics(stuck - offsets)
    assert np.all(ok["r_hat"] < 1.05)


def test_mcmc_diagnostics_validates_input():
    with pytest.raises(ValueError):
        df.mcmc_diagnostics(np.zeros((10, 4)))
    with pytest.raises(ValueError):
        df.mcmc_diagnostics(np.zeros((3, 4, 2)))
    # constant chains are trivially converged, not NaN
    diag = df.mcmc_diagnostics(np.ones((50, 4, 1)))
    assert diag["r_hat"][0] == 1.0


def test_clear_caches_forces_retrace():
    import sys

    from densityflows_tpu import inference

    # the package re-exports train() the FUNCTION as its `train`
    # attribute, so the module must come from sys.modules
    tr = sys.modules["densityflows_tpu.train"]

    flow = _identity_flow()
    kw = dict(n_chains=8, n_steps=6, burn_in=0, key=jax.random.key(7))
    before = inference.trace_counts.get("mcmc", 0)
    df.flow_mcmc(flow, _target_logp, **kw)
    df.flow_mcmc(flow, _target_logp, **kw)
    assert inference.trace_counts["mcmc"] == before + 1  # cache hit
    df.clear_caches()
    assert not tr._PROGRAM_CACHE
    df.flow_mcmc(flow, _target_logp, **kw)
    assert inference.trace_counts["mcmc"] == before + 2  # retraced
