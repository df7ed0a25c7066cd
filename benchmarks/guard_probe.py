"""Hardware parity probe for the round-4 kernel-surface growth.

Validates ON REAL MOSAIC (interpret-mode parity does not transfer —
the r2 PRNG sign-extension NaNs are this repo's own proof) the three
train() features that stopped forcing the jnp program (design.md §12d):

1. ``skip_nonfinite`` — NaN-poisoned rows must skip the SAME batch
   updates in the kernel as in the jnp program (identical per-epoch
   skip counts, identical finite params, identical Adam step count);
2. tagged-Adam hyperparameters — ``df.adam(lr, b1)`` in-kernel matches
   ``optax.adam(lr, b1)`` on the jnp program;
3. ``metrics_log`` on the fused path (host-side; smoke only).

Prints one JSON line with the max errors.
"""

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _leaf_err(a, b):
    import jax

    errs = [0.0]
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        if getattr(la, "size", 0):
            errs.append(float(np.max(np.abs(np.asarray(la) -
                                            np.asarray(lb)))))
    return max(errs)


def main():
    import jax
    import optax

    import densityflows_tpu as df

    # tiny op first: probe the TPU grant before real work
    jax.numpy.zeros(8).block_until_ready()
    print(f"grant OK ({jax.devices()[0].device_kind})", flush=True)

    out = {}

    # --- 1. skip_nonfinite parity (shared fixture: bench.guard_parity_case)
    import bench

    data, build_guard = bench.guard_parity_case(jax, df)
    f_j, f_f = build_guard(), build_guard()
    os_j = df.train(f_j, data, epochs=6, batchsize=16, verbose=False,
                    key=jax.random.key(3), skip_nonfinite=True,
                    fused_kernel=False)
    os_f = df.train(f_f, data, epochs=6, batchsize=16, verbose=False,
                    key=jax.random.key(3), skip_nonfinite=True,
                    fused_kernel=True)
    assert f_j.skipped_updates == f_f.skipped_updates, (
        f_j.skipped_updates, f_f.skipped_updates)
    assert sum(f_f.skipped_updates) > 0, "probe needs real skips"
    assert int(os_j[0].count) == int(os_f[0].count)
    for leaf in jax.tree_util.tree_leaves(f_f.model):
        assert np.all(np.isfinite(np.asarray(leaf)))
    out["guard_skips"] = f_f.skipped_updates
    out["guard_param_max_err"] = _leaf_err(f_j.model, f_f.model)
    print(f"skip_nonfinite: skips={f_f.skipped_updates} "
          f"param max err={out['guard_param_max_err']:.3e}", flush=True)

    # --- 2. tagged-Adam hyperparameters -------------------------------
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dat = np.load(os.path.join(here, "tests", "fixtures", "datatest.npz"))
    data2 = df.DataArrays.make(dat["x"], dat["theta"], rng=0)
    ks = jax.random.split(jax.random.key(0), 2)

    def build_adam():
        return df.Flow(df.flow_chain(
            df.coupling_layer(data2, [0, 1, 2], hidden_dim_s=16,
                              hidden_dim_t=16, key=ks[0]),
            df.coupling_layer(data2, [2, 3, 4], hidden_dim_s=16,
                              hidden_dim_t=16, key=ks[1]),
            df.normalization_layer(dat["x"], -1.0, 1.0),
        ), data2)

    f_j, f_f = build_adam(), build_adam()
    df.train(f_j, data2, optax.adam(3e-3, b1=0.85), epochs=20,
             verbose=False, key=jax.random.key(5), fused_kernel=False)
    df.train(f_f, data2, df.adam(3e-3, b1=0.85), epochs=20,
             verbose=False, key=jax.random.key(5), fused_kernel=True)
    out["adam_hist_max_err"] = float(np.max(np.abs(
        np.asarray(f_j.valid_loss) - np.asarray(f_f.valid_loss))))
    out["adam_param_max_err"] = _leaf_err(f_j.model, f_f.model)
    print(f"tagged adam: hist max err={out['adam_hist_max_err']:.3e} "
          f"param max err={out['adam_param_max_err']:.3e}", flush=True)

    # --- 3. metrics_log on the fused path (host-side smoke) -----------
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "m.jsonl")
        flow = build_adam()
        df.train(flow, data2, epochs=3, verbose=False,
                 key=jax.random.key(7), fused_kernel=True, metrics_log=p)
        lines = [json.loads(line) for line in open(p)]
        assert len(lines) == 3 and lines[-1]["epoch"] == 3
    out["metrics_log_fused"] = "ok"

    print(json.dumps(out))


if __name__ == "__main__":
    main()
