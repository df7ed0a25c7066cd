"""Streaming-pipeline benchmark: native C++ assembly vs NumPy fallback.

Measures (1) raw host batch-assembly throughput (shuffle + threaded row
gather) with the native library vs the pure-NumPy fallback, and (2) an
end-to-end streamed training epoch from a memory-mapped dataset. Prints
JSON lines.
"""

import json
import os
import tempfile
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import densityflows_tpu as df
    from densityflows_tpu import native
    from densityflows_tpu.data_stream import StreamingLoader

    n_rows, d, n_cond, batch = 1_000_000, 32, 8, 8192
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp()
    xpath = os.path.join(tmp, "x.npy")
    np.save(xpath, rng.normal(size=(n_rows, d)).astype(np.float32))
    x = np.load(xpath, mmap_mode="r")
    theta = rng.uniform(0, 1, size=(n_rows, n_cond)).astype(np.float32)

    # raw gather throughput, native vs fallback
    idx = rng.integers(0, n_rows, size=batch * 64).astype(np.int64)
    for tag, fn in [
        ("native_gather", lambda: native.gather_rows(np.asarray(x), idx)),
        ("numpy_gather", lambda: np.asarray(x)[idx]),
    ]:
        fn()  # warm page cache
        t0 = time.perf_counter()
        for _ in range(5):
            fn()
        dt = (time.perf_counter() - t0) / 5
        gbps = idx.size * d * 4 / dt / 1e9
        print(json.dumps({"variant": tag, "rows_per_sec": round(idx.size / dt, 1),
                          "gb_per_sec": round(gbps, 2),
                          "native_available": native.native_available()}))

    # loader epoch throughput (shuffle + assemble + double buffer)
    loader = StreamingLoader(x, theta, batchsize=batch, seed=0)
    t0 = time.perf_counter()
    rows = sum(int(m.sum()) for _, _, m in loader.epoch(0))
    dt = time.perf_counter() - t0
    print(json.dumps({"variant": "loader_epoch",
                      "rows_per_sec": round(rows / dt, 1)}))

    # end-to-end streamed training, one epoch
    data = df.DataArrays.make(np.asarray(x[:4096]), theta[:4096], rng=0)
    keys = jax.random.split(jax.random.key(0), 2)
    chain = df.flow_chain(
        *[df.coupling_block(d, None, n=n_cond, key=k,
                            hidden_dim_s=128, hidden_dim_t=128)
          for k in keys],
        df.normalization_layer(np.asarray(x[:4096]), -1.0, 1.0),
    )
    flow = df.Flow(chain, data)
    t0 = time.perf_counter()
    df.train_streaming(flow, x, theta, epochs=1, batchsize=batch,
                       verbose=False)
    dt = time.perf_counter() - t0
    print(json.dumps({"variant": "train_streaming_epoch",
                      "samples_per_sec": round(n_rows / dt, 1),
                      "final_nll": round(flow.training_loss[-1], 4)}))


if __name__ == "__main__":
    main()
