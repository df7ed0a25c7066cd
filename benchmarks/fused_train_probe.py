"""Whole-run fused train kernel vs the fused-XLA train program (TPU).

Standalone driver around the two bench.py primitives that gate/measure
the fused-train path on every driver run:

- ``bench.fused_train_parity_gate`` — 50-epoch loss-history parity,
  fused kernel vs jnp program, on real Mosaic (identical keys ⇒
  identical batch composition; raises past tolerance);
- ``bench.measure_train_paths`` — raw-program interleaved two-point
  rates for both paths (one dispatch per timed call; whole
  ``df.train()`` calls are never timed — their seconds of per-call host
  work swamps the device signal, r4 postmortem in design.md §12).

Round-4 v5e result: fused 55 µs/epoch vs jnp 567 µs/epoch on the
reference README config — 10.3×; ``train()`` auto-routes accordingly.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    import bench
    import densityflows_tpu as df

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dat = np.load(os.path.join(here, "tests", "fixtures", "datatest.npz"))
    x, theta = dat["x"], dat["theta"]
    data = df.DataArrays.make(x, theta, rng=0)
    ks = jax.random.split(jax.random.key(0), 3)

    def build_flow():
        chain = df.flow_chain(
            df.coupling_layer(data, [0, 1, 2], hidden_dim_s=16,
                              hidden_dim_t=16, key=ks[0]),
            df.coupling_layer(data, [2, 3, 4], hidden_dim_s=16,
                              hidden_dim_t=16, key=ks[1]),
            df.coupling_layer(data, [4, 0, 1], hidden_dim_s=16,
                              hidden_dim_t=16, key=ks[2]),
            df.normalization_layer(x, -1.0, 1.0),
        )
        return df.Flow(chain, data)

    # tiny op first: probe the TPU grant before real work
    jax.numpy.zeros(8).block_until_ready()
    print("grant OK", flush=True)

    par = bench.fused_train_parity_gate(jax, df, data, build_flow)
    print(f"parity 50 epochs: max err={par['fused_train_parity_max_err']:.3e}"
          f" final jnp={par['final_nll_jnp']:.4f}"
          f" fused={par['final_nll_fused']:.4f}", flush=True)

    sps_j, sps_f, det = bench.measure_train_paths(
        jax, df, build_flow(), data, verbose=True)
    print(f"jnp:   {det['jnp_us_per_epoch']:.1f} us/epoch -> "
          f"{sps_j/1e6:.2f}M samples/s")
    print(f"fused: {det['fused_us_per_epoch']:.1f} us/epoch -> "
          f"{sps_f/1e6:.2f}M samples/s")
    print(f"speedup: {sps_f/sps_j:.2f}x")
    print(json.dumps({**par, **det,
                      "jnp_samples_per_sec": sps_j,
                      "fused_samples_per_sec": sps_f}))


if __name__ == "__main__":
    main()
