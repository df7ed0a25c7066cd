"""Profile the wide-config batch-8192 → 32768 regression (VERDICT r3 #5).

design.md §11 records that quadrupling the per-chip batch degrades the
wide joint config superlinearly (and remat does NOT fix it, ruling out
HBM activation spill) but only hypothesized "an XLA fusion/tiling regime
shift". This probe replaces the hypothesis with evidence:

1. compile-level: `compiled.cost_analysis()` + `memory_analysis()` at
   both batch sizes (FLOPs / bytes accessed / temp allocation per
   sample — a superlinear jump names the materializing fusion);
2. device-level: a JAX profiler trace around ~30 hot steps at each
   batch, parsed to per-HLO-op self-times via tensorboard_plugin_profile
   (`hlo_stats`), top ops normalized per sample.

Run on the TPU: ``python benchmarks/batch32k_trace.py [out_dir]``.
"""

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 30
BATCHES = (8192, 32768)


def build(jax, df, batch):
    import jax.numpy as jnp
    import optax

    from densityflows_tpu.train import make_train_step

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
    return step, chain, opt.init(chain), base, x, th, mask


def compile_stats(jax, df, batch):
    """AOT cost/memory analysis of the train step at this batch."""
    step, model, opt_state, base, x, th, mask = build(jax, df, batch)
    lowered = step.lower(model, opt_state, base, x, th, mask)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    ma = compiled.memory_analysis()
    out = {
        "batch": batch,
        "flops_per_sample": ca.get("flops", 0) / batch,
        "bytes_accessed_per_sample": ca.get("bytes accessed", 0) / batch,
        "temp_bytes": getattr(ma, "temp_size_in_bytes", None),
        "argument_bytes": getattr(ma, "argument_size_in_bytes", None),
        "output_bytes": getattr(ma, "output_size_in_bytes", None),
    }
    # per-memory-space breakdown when exposed
    for k in ("bytes accessed0{}", "bytes accessed1{}", "bytes accessedout{}"):
        if k in ca:
            out[k.replace(" ", "_")] = ca[k] / batch
    return out


def traced_steps(jax, df, batch, logdir):
    from densityflows_tpu.utils.profiling import trace

    step, model, opt_state, base, x, th, mask = build(jax, df, batch)
    model, opt_state, loss = step(model, opt_state, base, x, th, mask)
    jax.block_until_ready(loss)  # compile outside the trace
    with trace(logdir):
        for _ in range(STEPS):
            model, opt_state, loss = step(model, opt_state, base, x, th,
                                          mask)
        jax.block_until_ready(loss)


def hlo_table(logdir):
    """Parse the xplane into per-op stats; returns rows or None."""
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
    except Exception as e:  # pragma: no cover
        print(f"[no tensorboard_plugin_profile: {e}]")
        return None
    xs = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.xplane.pb")))
    if not xs:
        print(f"[no xplane.pb under {logdir}]")
        return None
    try:
        data, _ = raw_to_tool_data.xspace_to_tool_data(xs, "hlo_stats", {})
    except Exception as e:  # pragma: no cover
        print(f"[hlo_stats conversion failed: {e}]")
        return None
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    return data


def main():
    import jax

    import densityflows_tpu as df

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/batch32k_trace"
    os.makedirs(out_dir, exist_ok=True)
    jax.numpy.zeros(8).block_until_ready()
    print("grant OK", flush=True)

    report = {}
    for batch in BATCHES:
        cs = compile_stats(jax, df, batch)
        print(json.dumps(cs), flush=True)
        report[f"compile_{batch}"] = cs

    for batch in BATCHES:
        logdir = os.path.join(out_dir, f"b{batch}")
        traced_steps(jax, df, batch, logdir)
        print(f"trace captured: {logdir}", flush=True)
        tab = hlo_table(logdir)
        if tab is not None:
            path = os.path.join(out_dir, f"hlo_stats_b{batch}.json")
            with open(path, "w") as f:
                f.write(tab if isinstance(tab, str) else json.dumps(tab))
            print(f"hlo stats -> {path}", flush=True)

    with open(os.path.join(out_dir, "compile_stats.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
