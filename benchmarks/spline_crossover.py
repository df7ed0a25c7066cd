"""Do spline (RQS) chains belong in the whole-chain fused kernel?

Measures, with the interleaved two-point scan method (docs/design.md §3),
the plain-XLA throughput of RQS coupling chains at the same configs where
the AFFINE whole-chain kernel wins (README §Performance crossover table),
against the affine XLA and affine fused rates at identical shapes.

Decision input (VERDICT r1 item 10): if XLA's spline fold is
matmul-bound like the affine fold (rate within ~2× of affine-XLA at the
wide config), the fused-chain speedup potential carries over and a
("spline", ...) kernel entry is worth building; if the elementwise
spline (bin search + rational quadratic) dominates, the kernel would buy
little. Run on the real TPU:

    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/spline_crossover.py
"""

import json
import time

import numpy as np

M1, M2, REPS = 2, 8, 5


def _timed(fn, *args):
    import jax

    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def _scan_rate(make_scan, work, *args):
    f1, f2 = make_scan(M1), make_scan(M2)
    f1(*args), f2(*args)
    ds = []
    for _ in range(REPS):
        t1 = _timed(f1, *args)
        t2 = _timed(f2, *args)
        ds.append((t2 - t1) / (M2 - M1))
    return work / float(np.median(ds))


def main():
    import jax
    import jax.numpy as jnp

    import densityflows_tpu as df

    results = {}
    for d, hidden, rows in ((16, 64, 1 << 18), (32, 128, 1 << 18),
                            (32, 256, 1 << 18)):
        n_cond = 8
        keys = jax.random.split(jax.random.key(0), 4)
        rng = np.random.default_rng(0)

        def build(kind):
            return df.flow_chain(*[
                df.coupling_block(d, None, n=n_cond, key=k, kind=kind,
                                  hidden_dim_s=hidden, hidden_dim_t=hidden)
                if kind is df.RNVPCouplingLayer else
                df.coupling_block(d, None, n=n_cond, key=k, kind=kind,
                                  hidden_dim_s=hidden)
                for k in keys
            ])

        x = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32))
        th = jnp.asarray(
            rng.uniform(0, 1, size=(rows, n_cond)).astype(np.float32))
        base = df.StandardNormal(d)

        def make_logprob_scan(chain):
            def make(m):
                @jax.jit
                def run(x, th):
                    def body(c, i):
                        # per-step input perturbation: keeps the body
                        # loop-VARIANT so XLA cannot hoist the whole
                        # inverse fold out of the scan
                        y = x + 1e-6 * i
                        z, ldj = chain.inverse(y, th)
                        return c + jnp.sum(base.log_prob(z) + ldj), None

                    tot, _ = jax.lax.scan(
                        body, jnp.float32(0),
                        jnp.arange(m, dtype=jnp.float32))
                    return tot

                return run

            return make

        for name, kind in (("affine", df.RNVPCouplingLayer),
                           ("spline", df.RQSCouplingLayer)):
            chain = build(kind)
            # interleave variants: build both scans, rate one then other
            rate = _scan_rate(make_logprob_scan(chain), rows, x, th)
            results[f"logprob_{name}_d{d}_h{hidden}"] = round(rate / 1e6, 2)

    print(json.dumps({"unit": "Mrows/s", **results}))


if __name__ == "__main__":
    main()
