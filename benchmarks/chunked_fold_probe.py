"""Row-chunked forward fold vs the straight fold at the d=128 pod config.

The h512 θ-sweep runs at 6.9M draws/s (20% of roofline) — the §13
mechanism suggests the fold is inter-layer HBM traffic: each of the 8
couplings reads and writes a (2^18, 512)-shaped activation through HBM.
Chunking the row axis (lax.map over blocks) bounds the live working set
so layer-to-layer traffic stays in cache-adjacent memory. This probe
measures the sweep rate at several chunk sizes, interleaved.

Run on the TPU:
    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/chunked_fold_probe.py
"""

import json
import time

import numpy as np

CHUNKS = (0, 4096, 8192, 16384, 65536)  # 0 = straight fold


def main():
    import jax
    import jax.numpy as jnp

    import densityflows_tpu as df

    d, n_cond, hidden, n_blocks = 128, 8, 512, 4
    total = 1 << 18
    rng = np.random.default_rng(0)
    x_ref = rng.normal(size=(512, d)).astype(np.float32)
    keys = jax.random.split(jax.random.key(0), n_blocks)
    chain = df.flow_chain(
        *[
            df.coupling_block(d, None, n=n_cond, key=k,
                              hidden_dim_s=hidden, hidden_dim_t=hidden,
                              joint_conditioner=True)
            for k in keys
        ],
        df.normalization_layer(x_ref, -1.0, 1.0),
    )
    base = df.StandardNormal(d)
    theta1 = jnp.asarray(
        rng.uniform(0, 1, size=(1, n_cond)).astype(np.float32))

    def make_prog(chunk, m):
        @jax.jit
        def run(key):
            def body(c, k):
                r = base.sample(k, (total,))
                if chunk:
                    thc = jnp.broadcast_to(theta1, (chunk, n_cond))

                    def chunk_body(cc, i):
                        rc = jax.lax.dynamic_slice_in_dim(
                            r, i * chunk, chunk)
                        out = chain.forward_(rc, thc)
                        return cc + jnp.sum(out), None

                    s, _ = jax.lax.scan(
                        chunk_body, jnp.float32(0),
                        jnp.arange(total // chunk))
                    return c + s, None
                th = jnp.broadcast_to(theta1, (total, n_cond))
                out = chain.forward_(r, th)
                return c + jnp.sum(out), None

            tot, _ = jax.lax.scan(body, jnp.float32(0),
                                  jax.random.split(key, m))
            return tot

        return run

    def timed(f, *a):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        return time.perf_counter() - t0

    m1, m2, reps = 2, 10, 5
    progs = {}
    k = jax.random.key(5)
    for c in CHUNKS:
        try:
            lo, hi = make_prog(c, m1), make_prog(c, m2)
            timed(lo, k), timed(hi, k)
            progs[c] = (lo, hi)
        except Exception as e:  # compile failure on one variant only
            print(json.dumps({"chunk": c, "compile_error":
                              f"{type(e).__name__}: {str(e)[:120]}"}),
                  flush=True)

    rates = {c: [] for c in progs}
    for _ in range(reps):
        for c, (lo, hi) in progs.items():  # interleaved
            t_lo = timed(lo, k)
            t_hi = timed(hi, k)
            rates[c].append(total * (m2 - m1) / (t_hi - t_lo))

    out = {}
    for c, v in rates.items():
        name = "straight" if c == 0 else f"chunk{c}"
        out[f"{name}_draws_per_sec"] = round(float(np.median(v)), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
