"""Localize the wide-config batch-8192 → 32768 regression (VERDICT r3 #5).

``jax.profiler.start_trace`` deadlocks over the tunneled axon backend
(blocks in a futex under the axon-remote-loop thread before writing any
xplane — r4 finding), so the evidence here comes from two
profiler-free angles:

1. compile-level (`--compile`): ``cost_analysis`` / ``memory_analysis``
   and the optimized-HLO fusion census at both batch sizes. Identical
   per-sample FLOPs with superlinear temp allocation = XLA materializes
   MORE intermediates per sample at the big batch (fusion splits).
2. segment differencing (default): interleaved two-point rates for
   three nested programs — forward loss only, loss+grad, full train
   step — at both batch sizes. The segment whose per-sample time grows
   names where the regression lives.

Run on the TPU: ``python benchmarks/batch32k_probe.py [--compile]``.
"""

import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = (8192, 32768)
REPS = 7


def build(jax, df, batch):
    import jax.numpy as jnp
    import optax

    from densityflows_tpu.train import make_train_step, masked_nll_loss

    d, n_cond, hidden, n_blocks = 32, 8, 256, 4
    rng = np.random.default_rng(0)
    x_ref = rng.normal(size=(512, d)).astype(np.float32)
    keys = jax.random.split(jax.random.key(0), n_blocks)
    chain = df.flow_chain(
        *[df.coupling_block(d, None, n=n_cond, key=k,
                            hidden_dim_s=hidden, hidden_dim_t=hidden,
                            joint_conditioner=True, zero_init_final=True)
          for k in keys],
        df.normalization_layer(x_ref, -1.0, 1.0),
    )
    base = df.StandardNormal(d)
    opt = optax.adam(1e-3)
    step = make_train_step(opt, mixed_precision=True)
    x = jnp.asarray(rng.normal(size=(batch, d)).astype(np.float32))
    th = jnp.asarray(rng.uniform(0, 1, size=(batch, n_cond)).astype(np.float32))
    mask = jnp.ones((batch,), jnp.float32)
    return step, chain, opt, base, x, th, mask, masked_nll_loss


def compile_report(jax, df):
    import collections

    out = {}
    for batch in BATCHES:
        step, model, opt, base, x, th, mask, _ = build(jax, df, batch)
        compiled = step.lower(model, opt.init(model), base, x, th,
                              mask).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        ma = compiled.memory_analysis()
        hlo = compiled.as_text()
        ops = collections.Counter(
            m.group(1) for m in re.finditer(r"= \S+ (\w+)\(", hlo))
        # rough census of materialized intermediates: non-parameter HBM
        # outputs = every named fusion/copy at top level
        out[batch] = {
            "flops_per_sample": ca.get("flops", 0) / batch,
            "bytes_accessed_per_sample": ca.get("bytes accessed", 0) / batch,
            "temp_bytes": getattr(ma, "temp_size_in_bytes", None),
            "temp_bytes_per_sample":
                getattr(ma, "temp_size_in_bytes", 0) / batch,
            "n_fusions": ops.get("fusion", 0),
            "n_copies": ops.get("copy", 0) + ops.get("copy-start", 0),
            "n_instructions": sum(ops.values()),
        }
        print(json.dumps({"batch": batch, **out[batch]}), flush=True)
    return out


def segment_rates(jax, df):
    """Interleaved two-point per-sample times for nested step segments."""
    import jax.numpy as jnp

    progs = {}
    for batch in BATCHES:
        step, model, opt, base, x, th, mask, loss_fn = build(jax, df, batch)
        opt_state = opt.init(model)

        from functools import partial

        lf = partial(loss_fn, mixed_precision=True)

        def make(kind, m, model=model, opt_state=opt_state, base=base,
                 x=x, th=th, mask=mask, opt=opt, lf=lf):
            @jax.jit
            def run(model, opt_state, key):
                def body(c, k):
                    mm, oo = c
                    # loop-variant input: fold the key into x so XLA
                    # cannot hoist the body (design.md §3 rule)
                    xx = x + 1e-6 * jax.random.uniform(k, (1,))
                    if kind == "fwd":
                        val = lf(mm, base, xx, th, mask)
                    elif kind == "grad":
                        val, grads = jax.value_and_grad(lf)(
                            mm, base, xx, th, mask)
                        val = val + sum(jnp.sum(g) for g in
                                        jax.tree_util.tree_leaves(grads))
                    else:  # full adam step
                        val, grads = jax.value_and_grad(lf)(
                            mm, base, xx, th, mask)
                        import optax as _optax

                        updates, oo = opt.update(grads, oo, mm)
                        mm = _optax.apply_updates(mm, updates)
                    return (mm, oo), val

                (mm, oo), vals = jax.lax.scan(
                    body, (model, opt_state), jax.random.split(key, m))
                return vals[-1]

            return run

        for kind in ("fwd", "grad", "step"):
            for m in (8, 64):
                progs[(batch, kind, m)] = (
                    make(kind, m), (model, opt_state, jax.random.key(1)))

    # compile everything first
    for (batch, kind, m), (f, args) in progs.items():
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        print(f"warm b{batch} {kind} m={m}: {time.perf_counter()-t0:.2f}s",
              flush=True)

    acc = {k: [] for k in progs if k[2] == 8}
    for r in range(REPS):
        for (batch, kind, m), (f, args) in progs.items():
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            dt = time.perf_counter() - t0
            key = (batch, kind, 8)
            if m == 8:
                acc[key].append(-dt)
            else:
                acc[key][-1] += dt
    out = {}
    for (batch, kind, _), ds in acc.items():
        per_step = float(np.median(ds)) / (64 - 8)
        out[f"{kind}_b{batch}_ns_per_sample"] = per_step / batch * 1e9
        out[f"{kind}_b{batch}_ms_per_step"] = per_step * 1e3
    print(json.dumps(out, indent=1), flush=True)
    return out


def main():
    import jax

    import densityflows_tpu as df

    jax.numpy.zeros(8).block_until_ready()
    print("grant OK", flush=True)
    if "--compile" in sys.argv:
        compile_report(jax, df)
    else:
        segment_rates(jax, df)


if __name__ == "__main__":
    main()
