"""Layer-protocol conformance: every flow element obeys the same contract.

Contract (SURVEY.md §2.4): ``forward``/``inverse`` return ``(y, ldj)``
with per-sample fp32 ldj of batch shape; ``forward_`` equals
``forward[0]``; forward∘inverse = id with ldj cancellation; ldj matches
the autodiff log|det J|; arbitrary leading batch dims are supported.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import densityflows_tpu as df

D, N = 4, 2


def _perturb(layer, seed, scale=0.15):
    leaves, treedef = jax.tree_util.tree_flatten(layer)
    rng = np.random.default_rng(seed)
    leaves = [
        jnp.asarray(l) + scale * jnp.asarray(rng.normal(size=l.shape), l.dtype)
        for l in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _layers():
    k = jax.random.key(0)
    rng = np.random.default_rng(0)
    x_ref = rng.normal(size=(64, D)).astype(np.float32)
    out = {
        "rnvp": _perturb(df.coupling_layer(D, [0, 1], n=N, key=k), 1),
        "nice": _perturb(
            df.coupling_layer(D, [1, 3], n=N, kind=df.NICECouplingLayer, key=k), 2
        ),
        "rqs": _perturb(
            df.coupling_layer(D, [0, 2], n=N, kind=df.RQSCouplingLayer, key=k),
            3, scale=0.05,
        ),
        "maf": _perturb(df.maf_layer(D, n=N, key=k), 4, scale=0.1),
        "iaf": _perturb(df.iaf_layer(D, n=N, key=k), 5, scale=0.1),
        "actnorm": _perturb(df.actnorm_layer(D), 6),
        "invlinear": _perturb(df.invertible_linear_layer(D, key=k), 7),
        "permutation": df.permutation_layer([2, 0, 3, 1]),
        "normalization": df.normalization_layer(x_ref, -1.0, 1.0),
        "logit": df.logit_layer(x_ref, margin=0.05),
    }
    return out


LAYERS = _layers()
# logit's forward maps R^d to the box; start inverse checks from data space
_DATA_SPACE = {"normalization", "logit"}


@pytest.mark.parametrize("name", sorted(LAYERS))
def test_roundtrip_ldj_cancellation_and_fast_path(name):
    layer = LAYERS[name]
    rng = np.random.default_rng(10)
    th = jnp.asarray(rng.uniform(size=(7, N)).astype(np.float32))
    if name in _DATA_SPACE:
        x = jnp.asarray(
            (rng.uniform(0.1, 0.9, size=(7, D)) * 2 - 1).astype(np.float32)
        )
        z, ldj_b = layer.inverse(x, th)
        x2, ldj_f = layer.forward(z, th)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=2e-4)
    else:
        z = jnp.asarray(rng.normal(size=(7, D)).astype(np.float32))
        x, ldj_f = layer.forward(z, th)
        z2, ldj_b = layer.inverse(x, th)
        np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(layer.forward_(z, th)), np.asarray(x), atol=1e-6
        )
    np.testing.assert_allclose(np.asarray(ldj_f + ldj_b), 0.0, atol=2e-4)
    assert ldj_f.shape == (7,)
    assert ldj_f.dtype == jnp.float32


@pytest.mark.parametrize("name", sorted(LAYERS))
def test_ldj_matches_autodiff_jacobian(name):
    layer = LAYERS[name]
    rng = np.random.default_rng(11)
    th = jnp.asarray(rng.uniform(size=(1, N)).astype(np.float32))
    if name in _DATA_SPACE:
        v = jnp.asarray((rng.uniform(0.2, 0.8, size=(D,)) * 2 - 1).astype(np.float32))
        fn = lambda u: layer.inverse(u[None], th)[0][0]
        _, ldj = layer.inverse(v[None], th)
    else:
        v = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
        fn = lambda u: layer.forward(u[None], th)[0][0]
        _, ldj = layer.forward(v[None], th)
    J = np.asarray(jax.jacobian(fn)(v))
    _, logdet = np.linalg.slogdet(J)
    np.testing.assert_allclose(float(ldj[0]), logdet, rtol=2e-3, atol=1e-5)


@pytest.mark.parametrize("name", sorted(LAYERS))
def test_multidim_batch_shapes(name):
    layer = LAYERS[name]
    rng = np.random.default_rng(12)
    th = jnp.asarray(rng.uniform(size=(3, 5, N)).astype(np.float32))
    if name in _DATA_SPACE:
        y = jnp.asarray(
            (rng.uniform(0.1, 0.9, size=(3, 5, D)) * 2 - 1).astype(np.float32)
        )
        out, ldj = layer.inverse(y, th)
    else:
        y = jnp.asarray(rng.normal(size=(3, 5, D)).astype(np.float32))
        out, ldj = layer.forward(y, th)
    assert out.shape == (3, 5, D)
    assert ldj.shape == (3, 5)
    # multi-dim batch agrees with the flattened computation row-by-row
    yf = y.reshape(15, D)
    thf = th.reshape(15, N)
    if name in _DATA_SPACE:
        out_f, ldj_f = layer.inverse(yf, thf)
    else:
        out_f, ldj_f = layer.forward(yf, thf)
    np.testing.assert_allclose(
        np.asarray(out).reshape(15, D), np.asarray(out_f), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ldj).reshape(15), np.asarray(ldj_f), atol=1e-5
    )
