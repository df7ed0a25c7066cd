"""TPU probe: whole-chain fused kernel vs per-layer fused vs plain XLA.

Measures, on the attached TPU chip, for the README config (d=5, hidden 16)
and the wide config (d=32, hidden 256, 4 blocks):

- density-eval rows/s (inverse fold + ldj): plain-XLA jnp path vs
  per-layer fused Pallas kernels vs the whole-chain one-kernel path,
- sampling rows/s (forward_ fold): jnp vs whole-chain vs the fully fused
  in-kernel-PRNG sampler,
- numerical parity of every fused path against the jnp oracle on-device,
  and N(0,1) moments of the in-kernel sampler.

Timing method: two-point scan differencing (same rationale as
benchmarks/wide_config.py) — the tunneled grant's per-dispatch latency
flips between ~1 ms and ~28 ms per process lifetime, so per-call timing
measures the tunnel. Each workload runs M reps inside one ``lax.scan``
program at two lengths; per-rep time is Δt/ΔM, which cancels the
dispatch constant exactly. Inputs are perturbed per rep so no
cross-iteration CSE can elide work.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/fused_chain_probe.py
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


def _rate(make_scan, rows, *args):
    """rows/s from two-point scan differencing; median over REPS."""
    f1, f2 = make_scan(M1), make_scan(M2)
    f1(*args), f2(*args)  # compile both lengths
    ds = []
    for _ in range(REPS):
        t1 = _timed(f1, *args)
        t2 = _timed(f2, *args)
        ds.append((t2 - t1) / (M2 - M1))
    return rows / float(np.median(ds))


def probe(name, d, n, hidden, n_blocks, rows):
    import jax
    import jax.numpy as jnp

    import densityflows_tpu as df
    import densityflows_tpu.models.layers as L
    from densityflows_tpu.models.fused_chain import (
        _plan_params,
        maybe_apply_fused,
    )
    from densityflows_tpu.ops.pallas_chain import run_chain, run_chain_sample

    rng = np.random.default_rng(0)
    x_ref = rng.normal(size=(512, d)).astype(np.float32)
    keys = jax.random.split(jax.random.key(0), n_blocks)
    # identity-at-init couplings (zero_init_final): full conditioner
    # compute, but no exp(s) blowup through deep untrained stacks
    chain = df.flow_chain(
        *[
            df.coupling_block(d, None, n=n, key=k, hidden_dim_s=hidden,
                              hidden_dim_t=hidden)
            for k in keys
        ],
        df.normalization_layer(x_ref, -1.0, 1.0),
    )
    theta = jnp.asarray(rng.uniform(0, 1, (rows, n)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32))
    res = {"config": name, "rows": rows}

    def scan_of(body):  # body(x, theta) -> array(s); summed into carry
        def make(m):
            @jax.jit
            def run(xx, tt):
                def f(c, i):
                    out = body(xx + i * 1e-6, tt)
                    leaves = jax.tree_util.tree_leaves(out)
                    return c + sum(jnp.sum(o) for o in leaves), None

                tot, _ = jax.lax.scan(
                    f, jnp.float32(0), jnp.arange(m, dtype=jnp.float32))
                return tot

            return run

        return make

    # --- parity (single call, values) -------------------------------------
    L.set_fused_kernels(False)
    z_ref, ldj_ref = jax.jit(lambda c, a, b: c.inverse(a, b))(chain, x, theta)
    L.set_fused_kernels(True)
    z_f, ldj_f = jax.jit(
        lambda c, a, b: maybe_apply_fused(c, a, b, "inv", True))(
        chain, x, theta)
    res["inv_z_maxdiff"] = float(jnp.abs(z_f - z_ref).max())
    res["inv_ldj_maxdiff"] = float(jnp.abs(ldj_f - ldj_ref).max())

    # --- density eval (inverse + ldj) rows/s -------------------------------
    L.set_fused_kernels(False)
    res["logprob_rows_s_jnp"] = _rate(
        scan_of(lambda a, b: chain.inverse(a, b)), rows, x, theta)
    L.set_fused_kernels(True)
    res["logprob_rows_s_perlayer_fused"] = _rate(
        scan_of(lambda a, b: chain.inverse(a, b)), rows, x, theta)
    res["logprob_rows_s_chain_fused"] = _rate(
        scan_of(lambda a, b: maybe_apply_fused(chain, a, b, "inv", True)),
        rows, x, theta)

    # --- sampling fold (forward_, no ldj) rows/s ---------------------------
    L.set_fused_kernels(False)
    res["sample_rows_s_jnp"] = _rate(
        scan_of(lambda a, b: chain.forward_(a, b)), rows, x, theta)
    L.set_fused_kernels(True)
    res["sample_rows_s_chain_fused"] = _rate(
        scan_of(lambda a, b: chain.forward_(a, b)), rows, x, theta)

    # --- fully fused sampler: in-kernel PRNG, θ broadcast from (1, n) ------
    plan, params = _plan_params(chain, "fwd")
    th1 = theta[:1]
    seed = jax.random.key_data(jax.random.key(7)).reshape(-1)[:2].astype(
        jnp.int32)

    def make_sampler_scan(m):
        @jax.jit
        def run(s, t):
            def f(c, i):
                out = run_chain_sample(plan, params, s + i, rows, d, t,
                                       interpret=False)
                return c + jnp.sum(out[0]), None

            tot, _ = jax.lax.scan(f, jnp.float32(0),
                                  jnp.arange(m, dtype=jnp.int32))
            return tot

        return run

    res["sample_rows_s_inkernel"] = _rate(make_sampler_scan, rows, seed, th1)
    out = jax.jit(lambda s, t: run_chain_sample(
        plan, params, s, rows, d, t, interpret=False))(seed, th1)
    arr = np.asarray(out)
    res["inkernel_finite"] = bool(np.all(np.isfinite(arr)))
    # identity-at-init chain + trailing normalization: invert the last
    # affine analytically, remaining z should be N(0, I)
    norm = chain.layers[-1]
    z = np.asarray(norm.inverse(jnp.asarray(arr))[0])
    res["inkernel_mean_err"] = float(np.abs(z.mean(0)).max())
    res["inkernel_std_err"] = float(np.abs(z.std(0) - 1.0).max())

    # --- tile-size sweep for the whole-chain kernel ------------------------
    plan_i, params_i = _plan_params(chain, "inv")
    for tb in (256, 512, 1024, 2048):
        try:
            res[f"chain_inv_rows_s_tb{tb}"] = _rate(
                scan_of(lambda a, b, _tb=tb: run_chain(
                    plan_i, params_i, a, b, with_ldj=True, tb=_tb,
                    interpret=False)),
                rows, x, theta)
        except Exception as e:
            res[f"chain_inv_rows_s_tb{tb}"] = f"error: {type(e).__name__}"
    L.set_fused_kernels("auto")
    return res


def main():
    import jax

    print("backend:", jax.default_backend(), jax.devices()[0])
    probes = [
        ("readme_d5_h16", 5, 1, 16, 3, 1 << 20),
        ("wide_d32_h256", 32, 8, 256, 4, 1 << 18),
    ]
    for args in probes:
        r = probe(*args)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
