"""Distributed systematic resampling over a sharded particle axis.

The SMC scaling hot spot (SURVEY.md §7 hard parts): naive resampling of a
sharded particle array gathers the full (n,) weight vector AND the full
(n, d) particle matrix onto every device. This module implements the
all_gather-free formulation:

1. per-device weight sums → one tiny (P,) all_gather of scalars → each
   device's *exclusive prefix offset* into the global CDF;
2. each device forms its local slice of the global CDF with one local
   cumsum (prefix-sum formulation — no (n,)-sized collective);
3. ancestors are fetched with a **ring pass**: particle blocks rotate
   around the ``data`` axis with ``lax.ppermute`` (P−1 steps of
   n/P × (d+1) floats — all_gather bandwidth, O(n/P) memory), and each
   device picks up the rows whose global CDF interval covers its
   stratified grid points.

Because systematic resampling assigns ancestors monotonically, every
device's output rows are a contiguous range of the global ancestor
sequence, and a visiting block resolves exactly the grid points that fall
in its CDF interval — so the ring pass loses nothing.

Runs inside ``jax.shard_map``; on one device it degrades to the plain
prefix-sum resampler (``inference.systematic_resample``) and the two
implementations agree exactly for the same u₀ (tested).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["systematic_resample_sharded"]


def _resample_block_local(lw_local, x_local, u0):
    """shard_map body: one device's block of log-weights and particles."""
    axis = "data"
    p = jax.lax.axis_size(axis)
    k = jax.lax.axis_index(axis)
    n_local = x_local.shape[0]
    n = n_local * p

    # -- global normalization without an (n,)-sized collective
    m = jax.lax.pmax(jnp.max(lw_local), axis)
    w = jnp.exp(lw_local - m)
    s_local = jnp.sum(w)
    sums = jax.lax.all_gather(s_local, axis)  # (P,) scalars — tiny
    denom = jnp.sum(sums)
    offset = jnp.sum(jnp.where(jnp.arange(p) < k, sums, 0.0))

    # local slice of the global CDF (prefix sum), and its lower bound
    cdf = (offset + jnp.cumsum(w)) / denom
    lo = offset / denom

    # stratified grid points owned by this device (global slots
    # [k·n_local, (k+1)·n_local), sorted) — u0 is replicated
    i0 = k * n_local
    u = (u0 + i0 + jnp.arange(n_local, dtype=jnp.float32)) / n

    out = jnp.zeros_like(x_local)
    filled = jnp.zeros((n_local,), jnp.bool_)
    # mark the freshly-created carries as device-varying so the fori_loop
    # carry types stay stable once ppermute data mixes in
    filled = jax.lax.pcast(filled, (axis,), to="varying")

    def ring_step(step, carry):
        blk_x, blk_cdf, blk_lo, out, filled = carry
        # resolve grid points covered by the visiting block's CDF interval
        hi = blk_cdf[-1]
        valid = jnp.logical_and(u > blk_lo, u <= hi)
        valid = jnp.logical_and(valid, jnp.logical_not(filled))
        sel = jnp.clip(jnp.searchsorted(blk_cdf, u, side="left"), 0, n_local - 1)
        picked = blk_x[sel]
        out = jnp.where(valid[:, None], picked, out)
        filled = jnp.logical_or(filled, valid)
        # rotate the block to the right neighbor (bidirectional rings
        # would halve latency; one direction keeps the code obvious)
        perm = [(i, (i + 1) % p) for i in range(p)]
        blk_x = jax.lax.ppermute(blk_x, axis, perm)
        blk_cdf = jax.lax.ppermute(blk_cdf, axis, perm)
        blk_lo = jax.lax.ppermute(blk_lo, axis, perm)
        return blk_x, blk_cdf, blk_lo, out, filled

    # P steps: own block first, then P−1 rotations
    carry = (x_local, cdf, lo, out, filled)
    carry = jax.lax.fori_loop(0, p, ring_step, carry)
    _, _, _, out, filled = carry
    # numerical guard: any unfilled slot (u beyond cdf[-1]≈1 by rounding)
    # takes the last local particle
    out = jnp.where(filled[:, None], out, x_local[-1])
    return out


def systematic_resample_sharded(
    log_weights: jax.Array,
    particles: jax.Array,
    key,
    mesh: Mesh,
    *,
    axis: str = "data",
):
    """Systematic resampling of ``particles`` (n, d) by ``log_weights``
    (n,), both sharded over ``mesh[axis]``. Returns the resampled
    particles with uniform weights implied; agrees exactly with
    ``inference.systematic_resample`` for the same stratified draw.
    """
    u0 = jax.random.uniform(key, ())
    fn = jax.shard_map(
        _resample_block_local,
        mesh=mesh,
        in_specs=(P(axis), P(axis, None), P()),
        out_specs=P(axis, None),
    )
    lw = log_weights.astype(jnp.float32)
    return fn(lw, particles, u0)
