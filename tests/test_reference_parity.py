"""Reference-parity regression against the EXACT optimal NLL.

The Julia reference cannot run in this environment (no julia binary, no
network), so — per BASELINE.md — the parity target is closed-form: the
reference fixture ``test/datatest.jld2`` follows the documented generator
(/root/reference/docs/src/example.md:5-20)

    x1 ~ N(0,1),  x5 ~ N(0,1)
    x2 | x1,θ ~ N(sin(x1/0.8) + θ, 0.3²)
    x3 | x1,θ ~ N(exp(x1/1.4)/10 − 0.1θ, (0.1θ)²)
    x4 | x1,θ ~ N(cos(x1/1.1) + θ, 0.3²)

so the true conditional density p(x|θ) — the density BOTH the reference
flow and this engine are trying to learn — is analytic. Verified against
the fixture: residual stds 0.300/0.990/0.306, optimal NLL over all 1000
rows = 2.767 ± 0.050 (recorded in BASELINE.md). A flow that "matches the
reference's learned density" must close most of the gap to this optimum;
these tests assert PAIRED per-row gaps (same rows for model and truth, so
Monte-Carlo noise cancels) — a direct KL(p‖q) estimate.
"""

import numpy as np
import jax
import optax
import pytest

import densityflows_tpu as df


def true_log_density(x: np.ndarray, theta: np.ndarray) -> np.ndarray:
    """Exact log p(x|θ) of the fixture generator (docs/src/example.md:5-20)."""
    x1, x2, x3, x4, x5 = np.asarray(x, np.float64).T
    th = np.asarray(theta, np.float64).reshape(-1)

    def lognorm(v, mu, sig):
        return -0.5 * np.log(2 * np.pi * sig**2) - 0.5 * ((v - mu) / sig) ** 2

    lp = lognorm(x1, 0.0, 1.0) + lognorm(x5, 0.0, 1.0)
    lp += lognorm(x2, np.sin(x1 / 0.8) + th, 0.3)
    lp += lognorm(x4, np.cos(x1 / 1.1) + th, 0.3)
    lp += lognorm(x3, np.exp(x1 / 1.4) / 10 - 0.1 * th, 0.1 * np.abs(th))
    return lp


@pytest.fixture(scope="module")
def fixture_arrays():
    d = np.load("tests/fixtures/datatest.npz")
    return d["x"], d["theta"]


def test_fixture_matches_documented_generator(fixture_arrays):
    """The analytic target is valid only if the fixture really follows the
    documented generator — check the residual moments."""
    x, theta = fixture_arrays
    x1 = x[:, 0].astype(np.float64)
    th = theta[:, 0].astype(np.float64)
    r2 = x[:, 1] - np.sin(x1 / 0.8) - th
    r3 = (x[:, 2] - np.exp(x1 / 1.4) / 10 + 0.1 * th) / (0.1 * np.abs(th))
    r4 = x[:, 3] - np.cos(x1 / 1.1) - th
    for r in (r2 / 0.3, r3, r4 / 0.3, x1, x[:, 4]):
        assert abs(np.mean(r)) < 0.1
        assert abs(np.std(r) - 1.0) < 0.1


def test_learned_density_matches_true_density(fixture_arrays):
    """Engine parity: with enough capacity the trained flow's held-out NLL
    must come within 0.15 nat of the EXACT optimum on the same rows
    (paired KL(p‖q) estimate), and must not beat it by more than MC noise.
    The measured gap on this config is ≈0.05 nat (BASELINE.md)."""
    x, theta = fixture_arrays
    data = df.DataArrays.make(x, theta, rng=0)
    ks = jax.random.split(jax.random.key(0), 5)
    chain = df.flow_chain(
        df.coupling_layer(data, [0, 1, 2], hidden_dim_s=64, hidden_dim_t=64, key=ks[0]),
        df.coupling_layer(data, [2, 3, 4], hidden_dim_s=64, hidden_dim_t=64, key=ks[1]),
        df.coupling_layer(data, [4, 0, 1], hidden_dim_s=64, hidden_dim_t=64, key=ks[2]),
        df.coupling_layer(data, [1, 2, 3], hidden_dim_s=64, hidden_dim_t=64, key=ks[3]),
        df.coupling_layer(data, [3, 4, 0], hidden_dim_s=64, hidden_dim_t=64, key=ks[4]),
        df.normalization_layer(x, -1.0, 1.0),
    )
    flow = df.Flow(chain, data)
    df.train(
        flow, data, optax.adam(1e-3), epochs=120, verbose=False,
        key=jax.random.key(1),
        early_stopping_patience=40, early_stopping_check_every=20,
    )

    iv = np.asarray(data.partition.validation)
    xv, thv = x[iv], theta[iv]
    nll_true = -np.mean(true_log_density(xv, thv))
    nll_model = df.evaluate(flow, data, "validation")
    gap = nll_model - nll_true  # paired per-row KL(p‖q) estimate
    assert gap < 0.15, (nll_model, nll_true)
    assert gap > -0.10, (nll_model, nll_true)  # can't beat the truth

    # pointwise: the learned log-density tracks the true one across rows
    # (the x3 conditional's σ=0.1|θ| makes log p spiky, so a 0.05-nat mean
    # gap corresponds to ≈0.91 linear correlation — measured 0.913)
    lp_model = np.asarray(flow.log_prob(xv, thv.astype(np.float32)))
    lp_true = true_log_density(xv, thv)
    corr = np.corrcoef(lp_model, lp_true)[0, 1]
    assert corr > 0.88, corr


def test_gaussian_closed_form_entropy():
    """Exactly-representable target: a correlated 2-D Gaussian's
    conditionals are linear-Gaussian, which affine couplings express
    exactly — the trained held-out NLL must match the per-row true NLL
    within 0.1 nat (paired comparison)."""
    rng = np.random.default_rng(0)
    cov = np.array([[1.0, 0.8], [0.8, 1.5]])
    L = np.linalg.cholesky(cov)
    xg = (rng.normal(size=(4000, 2)) @ L.T).astype(np.float32)
    data = df.DataArrays.make(xg, rng=0)
    ks = jax.random.split(jax.random.key(3), 2)
    chain = df.flow_chain(
        df.coupling_layer(data, [0], hidden_dim_s=32, hidden_dim_t=32, key=ks[0]),
        df.coupling_layer(data, [1], hidden_dim_s=32, hidden_dim_t=32, key=ks[1]),
        df.normalization_layer(xg, -1.0, 1.0),
    )
    flow = df.Flow(chain, data)
    df.train(
        flow, data, optax.adam(1e-3), epochs=120, verbose=False,
        key=jax.random.key(4),
        early_stopping_patience=30, early_stopping_check_every=15,
    )
    iv = np.asarray(data.partition.validation)
    xv = xg[iv].astype(np.float64)
    icov = np.linalg.inv(cov)
    lp_true = (-0.5 * np.einsum("ij,jk,ik->i", xv, icov, xv)
               - 0.5 * np.log((2 * np.pi) ** 2 * np.linalg.det(cov)))
    nll_true = -np.mean(lp_true)
    nll_model = df.evaluate(flow, data, "validation")
    assert abs(nll_model - nll_true) < 0.1, (nll_model, nll_true)
