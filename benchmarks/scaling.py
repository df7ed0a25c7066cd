"""Weak-scaling benchmark over mesh sizes.

On a multi-chip slice this measures ICI scaling; on a single chip or CPU
it runs on virtual devices (set
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` + CPU platform)
and validates the partitioned programs at every mesh size. Prints one
JSON line per mesh size.
"""

import json


def main():
    import jax
    import numpy as np

    import densityflows_tpu as df
    from densityflows_tpu.parallel.scaling import scaling_report

    d, n_cond = 16, 4
    rng = np.random.default_rng(0)
    x_ref = rng.normal(size=(256, d)).astype(np.float32)

    def make_model(key):
        keys = jax.random.split(key, 2)
        return df.flow_chain(
            *[df.coupling_block(d, None, n=n_cond, key=k,
                                hidden_dim_s=64, hidden_dim_t=64)
              for k in keys],
            df.normalization_layer(x_ref, -1.0, 1.0),
        )

    points = scaling_report(make_model, d, n_cond)
    for p in points:
        print(json.dumps({
            "n_devices": p.n_devices,
            "train_samples_per_sec": round(p.train_samples_per_sec, 1),
            "sample_draws_per_sec": round(p.sample_draws_per_sec, 1),
            "train_efficiency_vs_linear": round(p.train_efficiency, 3),
            "sample_efficiency_vs_linear": round(p.sample_efficiency, 3),
            "backend": jax.default_backend(),
        }))


if __name__ == "__main__":
    main()
