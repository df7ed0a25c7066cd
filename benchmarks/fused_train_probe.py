"""Whole-run fused train kernel vs the fused-XLA train program (TPU).

The reference README config (5-D, hidden-16, batch 64) trains
launch-bound: the jnp program's ~37 µs step is a sequence of tiny
kernels. The whole-run kernel (ops/pallas_train.py) holds params + Adam
moments in VMEM for the entire run — this probe measures both paths with
the same two-point method bench.py uses (train calls at 10 vs 510
epochs, rate from the difference; cancels the tunnel dispatch constant),
INTERLEAVED so the tunnel's dispatch-mode flips hit both variants.

Also gates on-hardware parity: 50-epoch loss histories fused vs jnp with
identical keys (batch composition is shared by construction).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPOCHS_LO, EPOCHS_HI = 10, 510
REPS = 5


def main():
    import jax

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

    n_train = len(data.partition.training)
    print(f"n_train={n_train}", flush=True)

    # tiny op first: probe the TPU grant before real work
    jax.numpy.zeros(8).block_until_ready()
    print("grant OK", flush=True)

    # parity on hardware: identical keys -> identical batch composition
    f_j, f_f = build_flow(), build_flow()
    df.train(f_j, data, epochs=50, verbose=False, key=jax.random.key(1))
    df.train(f_f, data, epochs=50, verbose=False, key=jax.random.key(1),
             fused_kernel=True)
    dtl = max(abs(a - b) for a, b in zip(f_j.train_loss, f_f.train_loss))
    dvl = max(abs(a - b) for a, b in zip(f_j.valid_loss, f_f.valid_loss))
    print(f"parity 50 epochs: max|dtrain|={dtl:.3e} max|dvalid|={dvl:.3e} "
          f"final jnp={f_j.train_loss[-1]:.4f} fused={f_f.train_loss[-1]:.4f}",
          flush=True)

    def run(fused, epochs):
        f = build_flow()
        t0 = time.perf_counter()
        df.train(f, data, epochs=epochs, verbose=False,
                 key=jax.random.key(2), fused_kernel=fused)
        return time.perf_counter() - t0

    # warm all four programs
    for fused in (False, True):
        for e in (EPOCHS_LO, EPOCHS_HI):
            t = run(fused, e)
            print(f"warm fused={fused} epochs={e}: {t:.3f}s", flush=True)

    dj, dfu = [], []
    for r in range(REPS):
        tj_lo = run(False, EPOCHS_LO)
        tj_hi = run(False, EPOCHS_HI)
        tf_lo = run(True, EPOCHS_LO)
        tf_hi = run(True, EPOCHS_HI)
        dj.append((tj_hi - tj_lo) / (EPOCHS_HI - EPOCHS_LO))
        dfu.append((tf_hi - tf_lo) / (EPOCHS_HI - EPOCHS_LO))
        print(f"rep {r}: jnp {dj[-1]*1e6:.1f} us/epoch, "
              f"fused {dfu[-1]*1e6:.1f} us/epoch", flush=True)

    ej = float(np.median(dj))
    ef = float(np.median(dfu))
    print(f"jnp:   {ej*1e6:.1f} us/epoch -> {n_train/ej/1e6:.2f}M samples/s")
    print(f"fused: {ef*1e6:.1f} us/epoch -> {n_train/ef/1e6:.2f}M samples/s")
    print(f"speedup: {ej/ef:.2f}x")


if __name__ == "__main__":
    main()
