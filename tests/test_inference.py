"""Inference engine: rejection sampling, weighted NLL, SNPE/VI, SMC.

No reference counterpart (capability addition per SURVEY.md §2.2); tests
check statistical correctness against analytic targets.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import densityflows_tpu as df


def _small_flow(d=2, n=0, key=0, hidden=16, n_layers=2):
    ks = jax.random.split(jax.random.key(key), n_layers)
    layers = []
    for i, k in enumerate(ks):
        mask = [j for j in range(d) if (j + i) % 2 == 0]
        layers.append(
            df.coupling_layer(d, mask, n=n, key=k,
                              hidden_dim_s=hidden, hidden_dim_t=hidden)
        )
    chain = df.flow_chain(*layers)
    md = df.MetaData("", d, n,
                     np.zeros(n, np.float32), np.ones(n, np.float32))
    return df.Flow(chain, md)


# -- rejection sampling -----------------------------------------------------


def test_rejection_sampling_satisfies_condition():
    flow = _small_flow()
    cond = lambda x: x[..., 0] > 0.0
    s = df.sample_with_rejection(flow, 500, cond, key=jax.random.key(1),
                                 batch=2048)
    s = np.asarray(s)
    assert s.shape == (500, 2)
    assert np.all(s[:, 0] > 0.0)


def test_rejection_sampling_cap_raises():
    flow = _small_flow()
    impossible = lambda x: x[..., 0] > 1e9
    with pytest.raises(RuntimeError, match="accepted only"):
        df.sample_with_rejection(flow, 10, impossible,
                                 key=jax.random.key(2),
                                 batch=64, max_rounds=3)


# -- weighted NLL -----------------------------------------------------------


def test_weighted_nll_uniform_weights_match_reference_loss():
    from densityflows_tpu.models.flow import nll_loss

    flow = _small_flow()
    x = jax.random.normal(jax.random.key(3), (64, 2))
    theta = jnp.zeros((64, 0))
    w = jnp.ones((64,))
    a = df.weighted_nll_loss(flow.model, flow.base, x, theta, w)
    b = nll_loss(flow.model, flow.base, x, theta)
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_weighted_train_step_downweights():
    """Zero-weight rows must not influence the gradient."""
    import optax

    flow = _small_flow()
    opt = optax.adam(1e-3)
    step = df.make_weighted_train_step(opt)
    x = jax.random.normal(jax.random.key(4), (32, 2))
    xg = jnp.concatenate([x, 100.0 * jnp.ones((32, 2))])  # garbage rows
    theta = jnp.zeros((64, 0))
    w = jnp.concatenate([jnp.ones((32,)), jnp.zeros((32,))])

    from densityflows_tpu.models.flow import nll_loss
    ref_loss = nll_loss(flow.model, flow.base, x, jnp.zeros((32, 0)))
    # step donates model/opt_state — reference loss computed above first
    m1, _, loss1 = step(flow.model, opt.init(flow.model), flow.base,
                        xg, theta, w)
    np.testing.assert_allclose(loss1, ref_loss, rtol=1e-5)


# -- SNPE / posterior fit ---------------------------------------------------


def test_fit_posterior_learns_conditional_mean():
    """Simulator: x ~ N(theta, 0.1); posterior q(theta|x) should put its
    mass near x."""
    rng = np.random.default_rng(0)
    n = 2000
    theta = rng.uniform(-1, 1, size=(n, 1)).astype(np.float32)
    x = (theta + 0.1 * rng.normal(size=(n, 1))).astype(np.float32)

    flow = _small_flow(d=1, n=1, hidden=16, n_layers=2)
    # d=1: masks collapse — build by hand: one layer transforming dim 0
    chain = df.flow_chain(
        df.coupling_layer(1, [0], n=1, key=jax.random.key(0),
                          hidden_dim_s=16, hidden_dim_t=16),
    )
    md = df.MetaData("", 1, 1, x.min(0), x.max(0))
    flow = df.Flow(chain, md)
    df.fit_posterior(flow, theta, x, epochs=60, key=jax.random.key(1))

    # sample posterior at x*=0.5 → mean ≈ 0.5
    post = np.asarray(flow.sample((4000,), (0.5,), key=jax.random.key(2)))
    assert abs(post.mean() - 0.5) < 0.15


def test_fit_posterior_weighted_path_runs():
    rng = np.random.default_rng(1)
    n = 256
    theta = rng.uniform(-1, 1, size=(n, 1)).astype(np.float32)
    x = (theta + 0.1 * rng.normal(size=(n, 1))).astype(np.float32)
    chain = df.flow_chain(
        df.coupling_layer(1, [0], n=1, key=jax.random.key(0),
                          hidden_dim_s=8, hidden_dim_t=8),
    )
    flow = df.Flow(chain, df.MetaData("", 1, 1, x.min(0), x.max(0)))
    w = np.ones(n, np.float32)
    df.fit_posterior(flow, theta, x, weights=w, epochs=2,
                     key=jax.random.key(1))
    assert len(flow.train_loss) == 2
    assert np.all(np.isfinite(flow.train_loss))


# -- VI ---------------------------------------------------------------------


def test_fit_variational_matches_gaussian_target():
    """Fit an unconditional flow to N(mu, sigma^2 I) by reverse KL."""
    mu = jnp.array([1.0, -0.5])
    sigma = 0.7

    def log_p(x):
        return -0.5 * jnp.sum((x - mu) ** 2, axis=-1) / sigma**2

    flow = _small_flow(key=5)
    df.fit_variational(flow, log_p, steps=400, n_particles=512,
                       key=jax.random.key(6))
    s = np.asarray(flow.sample((8000,), key=jax.random.key(7)))
    np.testing.assert_allclose(s.mean(0), np.asarray(mu), atol=0.15)
    np.testing.assert_allclose(s.std(0), sigma, atol=0.15)


# -- SMC --------------------------------------------------------------------


def test_effective_sample_size():
    lw = jnp.zeros(100)
    np.testing.assert_allclose(df.effective_sample_size(lw), 100.0, rtol=1e-5)
    lw = jnp.array([0.0] + [-1e9] * 99)
    np.testing.assert_allclose(df.effective_sample_size(lw), 1.0, rtol=1e-5)


def test_systematic_resample_is_unbiased():
    n = 1000
    lw = jnp.log(jnp.arange(1, n + 1, dtype=jnp.float32))
    idx = df.systematic_resample(lw, jax.random.key(8))
    assert idx.shape == (n,)
    # expected multiplicity of particle i ∝ w_i; check top-weight particle
    counts = np.bincount(np.asarray(idx), minlength=n)
    w = np.arange(1, n + 1) / np.sum(np.arange(1, n + 1))
    # systematic resampling: count within ±1 of n*w
    assert abs(counts[-1] - n * w[-1]) <= 1.0 + 1e-6


def test_run_smc_gaussian_target():
    mu = np.array([2.0, -1.0], np.float32)

    def log_p(x):
        return -0.5 * jnp.sum((x - mu) ** 2, axis=-1)

    particles, log_w, diag = df.run_smc(
        log_p, d=2, n_particles=2048, n_steps=10,
        init_scale=3.0, key=jax.random.key(9), mh_step_size=0.5, n_mh=3,
    )
    w = np.exp(np.asarray(log_w) - np.max(np.asarray(log_w)))
    w = w / w.sum()
    est = (np.asarray(particles) * w[:, None]).sum(0)
    np.testing.assert_allclose(est, mu, atol=0.25)
    assert np.all(np.asarray(diag["ess"]) > 0)


def test_run_smc_sharded():
    """SMC over a sharded particle axis on the 8-device CPU mesh."""
    from densityflows_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()

    def log_p(x):
        return -0.5 * jnp.sum(x * x, axis=-1)

    particles, log_w, _ = df.run_smc(
        log_p, d=2, n_particles=1024, n_steps=5, key=jax.random.key(10),
        mesh=mesh,
    )
    assert particles.shape == (1024, 2)
    assert np.all(np.isfinite(np.asarray(particles)))


# -- program caches (one compile per static config) ---------------------------


def test_rejection_sampler_program_cached():
    from densityflows_tpu import inference as inf

    flow = _small_flow(key=11)
    cond = lambda x: x[..., 0] > -100.0  # accept everything
    inf.trace_counts.pop("rejection", None)
    s1 = df.sample_with_rejection(flow, 32, cond, key=jax.random.key(1),
                                  batch=128)
    s2 = df.sample_with_rejection(flow, 32, cond, key=jax.random.key(2),
                                  batch=128)
    assert inf.trace_counts["rejection"] == 1, (
        "second identically-configured call must reuse the compiled program"
    )
    assert not np.allclose(np.asarray(s1), np.asarray(s2))  # keys differ
    # a different static config compiles its own program
    df.sample_with_rejection(flow, 32, cond, key=jax.random.key(3), batch=256)
    assert inf.trace_counts["rejection"] == 2


def test_rejection_sampler_mesh_matches_single_device():
    from densityflows_tpu.parallel.mesh import make_mesh

    flow = _small_flow(key=12)
    cond = lambda x: x[..., 0] > 0.0
    mesh = make_mesh()
    s_mesh = df.sample_with_rejection(flow, 64, cond, key=jax.random.key(5),
                                      batch=512, mesh=mesh)
    s_mesh = np.asarray(s_mesh)
    assert s_mesh.shape == (64, 2)
    assert np.all(s_mesh[:, 0] > 0.0)
    assert np.isfinite(s_mesh).all()


def test_mcmc_program_cached():
    from densityflows_tpu import inference as inf

    flow = _small_flow(key=13)
    logp = lambda x: -0.5 * jnp.sum(x * x, axis=-1)
    inf.trace_counts.pop("mcmc", None)
    df.flow_mcmc(flow, logp, n_chains=8, n_steps=20, burn_in=5,
                 key=jax.random.key(1))
    # different key AND different burn_in (applied outside the program)
    df.flow_mcmc(flow, logp, n_chains=8, n_steps=20, burn_in=10,
                 key=jax.random.key(2))
    assert inf.trace_counts["mcmc"] == 1
    df.flow_mcmc(flow, logp, n_chains=8, n_steps=20, burn_in=5,
                 method="neutra", key=jax.random.key(3))
    assert inf.trace_counts["mcmc"] == 2


def test_smc_program_cached():
    from densityflows_tpu import inference as inf

    logp = lambda x: -0.5 * jnp.sum((x - 1.0) ** 2, axis=-1)
    inf.trace_counts.pop("smc", None)
    df.run_smc(logp, d=2, n_particles=128, n_steps=4, key=jax.random.key(1))
    df.run_smc(logp, d=2, n_particles=128, n_steps=4, key=jax.random.key(2))
    assert inf.trace_counts["smc"] == 1
    # identity check: a NEW (even if identical) callable must NOT reuse
    # the old program, which captured the old closure
    logp2 = lambda x: -0.5 * jnp.sum((x - 1.0) ** 2, axis=-1)
    df.run_smc(logp2, d=2, n_particles=128, n_steps=4, key=jax.random.key(3))
    assert inf.trace_counts["smc"] == 2
