"""Scaling harness: measured samples/s across mesh sizes.

The north-star protocol (BASELINE.md: ≥80% linear samples/s scaling from
1 chip to N) needs a harness, not a claim. This module runs the SAME
jitted train-step / sampling-sweep on submeshes of growing size with the
per-device batch held constant (weak scaling) and reports throughput and
efficiency vs linear.

On a real multi-chip slice this measures ICI collectives; on the
CPU-virtual-device test rig it validates that the programs partition and
execute at every mesh size (the standard pjit test path, SURVEY.md §4).
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .mesh import data_sharding, make_mesh, replicated

__all__ = ["ScalingPoint", "scaling_report"]


@dataclasses.dataclass(frozen=True)
class ScalingPoint:
    n_devices: int
    train_samples_per_sec: float
    sample_draws_per_sec: float
    train_efficiency: float  # vs linear from the 1-device point
    sample_efficiency: float


def _time_reps(fn, reps):
    out = fn()  # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def scaling_report(
    make_model,
    d: int,
    n_cond: int,
    *,
    per_device_batch: int = 1024,
    device_counts=None,
    reps: int = 10,
    seed: int = 0,
) -> list[ScalingPoint]:
    """Weak-scaling sweep of the fused train step and the sampling sweep.

    ``make_model(key)`` builds the flow chain; the global batch is
    ``per_device_batch × n_devices`` at every point, sharded over a
    1-axis ``data`` mesh of each size in ``device_counts`` (default:
    powers of two up to the local device count).
    """
    from ..models.distributions import StandardNormal
    from ..train import make_train_step

    all_devices = jax.devices()
    if device_counts is None:
        device_counts = [
            n for n in (1, 2, 4, 8, 16, 32, 64) if n <= len(all_devices)
        ]

    base = StandardNormal(d)
    optimizer = optax.adam(1e-3)
    step = make_train_step(optimizer)
    rng = np.random.default_rng(seed)
    points: list[ScalingPoint] = []
    t1 = s1 = None

    for n_dev in device_counts:
        mesh = make_mesh((n_dev,), ("data",), devices=all_devices[:n_dev])
        batch = per_device_batch * n_dev
        model = jax.device_put(make_model(jax.random.key(seed)), replicated(mesh))
        opt_state = jax.device_put(optimizer.init(model), replicated(mesh))
        x = jax.device_put(
            rng.normal(size=(batch, d)).astype(np.float32),
            data_sharding(mesh, 2),
        )
        theta = jax.device_put(
            rng.uniform(0, 1, size=(batch, n_cond)).astype(np.float32),
            data_sharding(mesh, 2),
        )
        mask = jax.device_put(
            np.ones((batch,), np.float32), data_sharding(mesh, 1)
        )

        state = {"m": model, "o": opt_state}

        def train_once(state=state, x=x, theta=theta, mask=mask):
            m, o, loss = step(state["m"], state["o"], base, x, theta, mask)
            state["m"], state["o"] = m, o
            return loss

        dt_train = _time_reps(train_once, reps)
        tps = batch / dt_train

        model_s = state["m"]

        @jax.jit
        def full_sweep(model_s, key, theta):
            # end-to-end sweep: on-device base draw → ldj-free chain forward
            r = base.sample(key, (batch,))
            r = jax.lax.with_sharding_constraint(r, data_sharding(mesh, 2))
            return model_s.forward_(r, theta)

        keys = iter(jax.random.split(jax.random.key(seed + 1), reps + 1))

        def sample_once():
            return full_sweep(model_s, next(keys), theta)

        dt_sample = _time_reps(sample_once, reps)
        sps = batch / dt_sample

        if t1 is None:
            t1, s1 = tps, sps
        points.append(
            ScalingPoint(
                n_dev,
                tps,
                sps,
                tps / (t1 * n_dev),
                sps / (s1 * n_dev),
            )
        )
    return points
