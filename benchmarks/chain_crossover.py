"""Crossover sweep: where the whole-chain fused kernel beats plain XLA.

Sweeps (d, hidden) configurations measuring density-eval rows/s for the
pure-XLA fold vs the one-kernel chain path, using the same two-point scan
timing as benchmarks/fused_chain_probe.py (the tunneled grant's dispatch
latency makes per-call timing meaningless). The resulting table places
the "auto" routing thresholds in ``models.layers.use_fused_chain``.

Measured v5e results (2026-08, also in docs/design.md):

    d=5  h=64 : 0.34x   (XLA hits VPU roofline on small-d chains)
    d=8  h=32 : ~0.7x   (noisy; both paths extremely fast)
    d=16 h=64 : 1.43x
    d=16 h=128: 2.58x
    d=32 h=128: 3.06x
    d=32 h=256: 2.77x   (from fused_chain_probe.py)

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/chain_crossover.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fused_chain_probe import _rate  # noqa: E402


def run(d, n, hidden, n_blocks, rows):
    import jax
    import jax.numpy as jnp

    import densityflows_tpu as df
    import densityflows_tpu.models.layers as L
    from densityflows_tpu.models.fused_chain import maybe_apply_fused

    rng = np.random.default_rng(0)
    x_ref = rng.normal(size=(256, d)).astype(np.float32)
    ks = jax.random.split(jax.random.key(0), n_blocks)
    chain = df.flow_chain(
        *[df.coupling_block(d, None, n=n, key=k, hidden_dim_s=hidden,
                            hidden_dim_t=hidden) for k in ks],
        df.normalization_layer(x_ref, -1.0, 1.0))
    theta = jnp.asarray(rng.uniform(0, 1, (rows, n)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32))

    def scan_of(body):
        def make(m):
            @jax.jit
            def runf(xx, tt):
                def f(c, i):
                    out = body(xx + i * 1e-6, tt)
                    leaves = jax.tree_util.tree_leaves(out)
                    return c + sum(jnp.sum(o) for o in leaves), None

                tot, _ = jax.lax.scan(f, jnp.float32(0),
                                      jnp.arange(m, dtype=jnp.float32))
                return tot

            return runf

        return make

    L.set_fused_kernels(False)
    r_jnp = _rate(scan_of(lambda a, b: chain.inverse(a, b)), rows, x, theta)
    L.set_fused_kernels(True)
    r_chain = _rate(
        scan_of(lambda a, b: maybe_apply_fused(chain, a, b, "inv", True)),
        rows, x, theta)
    L.set_fused_kernels("auto")
    print(json.dumps({"d": d, "n": n, "hidden": hidden, "blocks": n_blocks,
                      "rows": rows, "jnp_rows_s": round(r_jnp),
                      "chain_rows_s": round(r_chain),
                      "speedup": round(r_chain / r_jnp, 2)}), flush=True)


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    for cfg in [(8, 2, 32, 3, 1 << 19),
                (16, 4, 64, 3, 1 << 19),
                (16, 4, 128, 4, 1 << 18),
                (32, 8, 128, 4, 1 << 18),
                (5, 1, 64, 3, 1 << 19)]:
        run(*cfg)


if __name__ == "__main__":
    main()
