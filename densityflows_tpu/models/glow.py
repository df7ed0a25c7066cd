"""Glow-family layers: ActNorm and LU-parameterized invertible linear.

Capability additions beyond the reference (which flags batch-norm as "not
implemented", /root/reference/src/norm/Normalization.jl:48-49, and mixes
dims only through hand-picked coupling masks). Both are standard
normalizing-flow components (Kingma & Dhariwal, "Glow", 2018), redesigned
for TPU:

- :class:`ActNormLayer` is the TPU-friendly replacement for batch-norm in
  flows: a *trainable* per-dim affine whose init is data-dependent
  (latents start whitened) but whose apply is batch-independent — no
  cross-batch statistics, so it shards trivially over the data mesh axis
  and needs no collective in the jitted train step.
- :class:`InvertibleLinearLayer` generalizes Glow's invertible 1x1
  convolution to the i.i.d.-vector setting: a dense, trainable feature
  mixing W = P L U with the log-determinant read off the U diagonal in
  O(d). The forward (sampling) direction uses two triangular solves; d is
  O(10^2) here so both directions are MXU-trivial and fuse into the
  surrounding program.

Direction convention matches the rest of the package (SURVEY.md §2.4.4):
``forward`` = latent → data, ``inverse`` = data → latent, both returning
fp32 per-sample ldj of batch shape; ``forward_`` is the ldj-free sampling
fast path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ActNormLayer", "actnorm_layer",
    "InvertibleLinearLayer", "invertible_linear_layer",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ActNormLayer:
    """Trainable per-dim affine: z = (x - bias) * exp(log_scale).

    Unlike :class:`~densityflows_tpu.models.normalization.NormalizationLayer`
    (non-trainable, pinned to the data range — reference
    Normalization.jl:30-35), ActNorm's bias/log_scale are optimizer leaves;
    the data only sets the *initialization* (per-dim whitening).
    """

    bias: jax.Array       # (d,)
    log_scale: jax.Array  # (d,)

    def _ldj(self, batch_shape):
        val = jnp.sum(self.log_scale.astype(jnp.float32))
        return jnp.broadcast_to(val, batch_shape)

    def inverse(self, x, theta=None):
        """data → latent: z = (x - b)·exp(s); ldj = +Σ log_scale."""
        z = (x - self.bias) * jnp.exp(self.log_scale)
        return z, self._ldj(x.shape[:-1])

    def forward(self, z, theta=None):
        """latent → data: x = z·exp(−s) + b; ldj = −Σ log_scale."""
        x = z * jnp.exp(-self.log_scale) + self.bias
        return x, -self._ldj(z.shape[:-1])

    def forward_(self, z, theta=None):
        return z * jnp.exp(-self.log_scale) + self.bias

    def summarize(self) -> str:
        return f"ActNorm Layer     | d = {self.bias.shape[0]} (trainable)"


def actnorm_layer(x, *, eps: float = 1e-6) -> ActNormLayer:
    """Data-dependent init (Glow §3.1): bias = per-dim mean, log_scale =
    −log(std), so the first inverse pass emits whitened latents. Accepts a
    data array ``(batch..., d)``, a :class:`~densityflows_tpu.data.DataArrays`
    (uses its x), or an ``int d`` for identity init."""
    from ..data import DataArrays

    if isinstance(x, int):
        d = x
        return ActNormLayer(jnp.zeros((d,)), jnp.zeros((d,)))
    if isinstance(x, DataArrays):
        x = x.x
    x = np.asarray(x, np.float32).reshape(-1, np.shape(x)[-1])
    mean = x.mean(axis=0)
    std = x.std(axis=0)
    return ActNormLayer(
        jnp.asarray(mean), jnp.asarray(-np.log(std + eps), jnp.float32)
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class InvertibleLinearLayer:
    """Dense invertible feature mixing, W = P·L·U (Glow's 1x1 conv for
    i.i.d. vectors).

    ``P`` is a static permutation; ``L`` is unit-lower-triangular (the
    strict lower part of ``lower`` is trainable); ``U``'s strict upper part
    is trainable and its diagonal is ``sign · exp(log_s)`` with static
    signs, so log|det W| = Σ log_s without any determinant evaluation.
    """

    lower: jax.Array   # (d, d), strict lower part used
    upper: jax.Array   # (d, d), strict upper part used
    log_s: jax.Array   # (d,)
    perm: tuple = dataclasses.field(metadata=dict(static=True))
    sign: tuple = dataclasses.field(metadata=dict(static=True))

    @property
    def d(self) -> int:
        return len(self.perm)

    def _lu(self):
        d = self.d
        dtype = self.log_s.dtype
        eye = jnp.eye(d, dtype=dtype)
        l = jnp.tril(self.lower, -1) + eye
        diag = jnp.asarray(self.sign, dtype) * jnp.exp(self.log_s)
        u = jnp.triu(self.upper, 1) + jnp.diag(diag)
        return l, u

    def _w(self):
        l, u = self._lu()
        return (l @ u)[list(self.perm), :]  # rows permuted: W = P L U

    def _inv_perm(self):
        inv = np.empty(self.d, np.int64)
        inv[list(self.perm)] = np.arange(self.d)
        return inv.tolist()

    def _ldj(self, batch_shape):
        val = jnp.sum(self.log_s.astype(jnp.float32))
        return jnp.broadcast_to(val, batch_shape)

    def inverse(self, x, theta=None):
        """data → latent: z = x Wᵀ (one matmul); ldj = +Σ log_s."""
        z = x @ self._w().T
        return z, self._ldj(x.shape[:-1])

    def _solve(self, z):
        """latent → data: solve W xᵀ = zᵀ via the LU factors (two
        triangular solves — no matrix inverse is ever formed)."""
        from jax.scipy.linalg import solve_triangular

        l, u = self._lu()
        batch_shape = z.shape[:-1]
        v = z.reshape(-1, self.d)[:, self._inv_perm()].T     # P⁻¹ zᵀ
        y = solve_triangular(l, v, lower=True, unit_diagonal=True)
        x = solve_triangular(u, y, lower=False)
        return x.T.reshape(batch_shape + (self.d,))

    def forward(self, z, theta=None):
        return self._solve(z), -self._ldj(z.shape[:-1])

    def forward_(self, z, theta=None):
        return self._solve(z)

    def summarize(self) -> str:
        return f"InvertibleLinear  | d = {self.d} (P·L·U, trainable)"


def invertible_linear_layer(d: int, *, key=None, dtype=jnp.float32) -> InvertibleLinearLayer:
    """Init as a random rotation (QR of a Gaussian), LU-factorized once on
    the host so training never touches a determinant or pivot."""
    import scipy.linalg

    if key is None:
        key = jax.random.key(0)
    rng = np.random.default_rng(np.asarray(jax.random.key_data(key)).sum())
    q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    p, l, u = scipy.linalg.lu(q.astype(np.float64))
    # p @ l @ u = q with p a permutation matrix; perm[i] = row of (l@u) that
    # lands in row i of W, i.e. argmax over p's columns.
    perm = tuple(int(j) for j in np.argmax(p, axis=1))
    diag = np.diag(u).copy()
    sign = tuple(float(s) for s in np.sign(diag))
    log_s = np.log(np.abs(diag))
    return InvertibleLinearLayer(
        jnp.asarray(np.tril(l, -1), dtype),
        jnp.asarray(np.triu(u, 1), dtype),
        jnp.asarray(log_s, dtype),
        perm,
        sign,
    )
