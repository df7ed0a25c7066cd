"""Joint-chain fused-vs-XLA crossover at the routing-threshold sizes."""
import dataclasses, time, numpy as np, jax, jax.numpy as jnp
import densityflows_tpu as df
from densityflows_tpu.models.fused_chain import _chain_fused, _jnp_chain

def damp(el):
    from densityflows_tpu.ops.mlp import MLP
    return jax.tree_util.tree_map(
        lambda n: MLP(tuple(list(n.weights)[:-1] + [n.weights[-1]*0.05]),
                      n.biases, n.activation) if isinstance(n, MLP) else n,
        el, is_leaf=lambda n: isinstance(n, MLP))

def timed(f, k):
    t0=time.perf_counter(); jax.block_until_ready(f(k)); return time.perf_counter()-t0

rng = np.random.default_rng(0)
jax.block_until_ready(jnp.zeros(1)+1)
for d, hidden in ((5, 16), (16, 64), (32, 128)):
    n_cond = 2
    keys = jax.random.split(jax.random.key(0), 3)
    x_ref = rng.normal(size=(128, d)).astype(np.float32)
    chain = damp(df.flow_chain(
        *[df.coupling_block(d, None, n=n_cond, key=k, hidden_dim_s=hidden,
                            hidden_dim_t=hidden, joint_conditioner=True,
                            zero_init_final=False) for k in keys],
        df.normalization_layer(x_ref, -1.0, 1.0)))
    rows = 1 << 18
    x = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32)*0.5)
    th = jnp.asarray(rng.uniform(0, 1, size=(rows, n_cond)).astype(np.float32))
    fns = {}
    for tag, fn in (("fused", _chain_fused), ("jnp", _jnp_chain)):
        def mk(m, fn=fn):
            @jax.jit
            def run(key):
                def body(c, k):
                    xx = x + 1e-6*jax.random.key_data(k)[0].astype(jnp.float32)
                    y, ldj = fn(chain, xx, th, "inv", True)
                    return c + jnp.sum(y) + jnp.sum(ldj), None
                tot, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, m))
                return tot
            return run
        f1, f2 = mk(2), mk(10)
        jax.block_until_ready(f1(jax.random.key(0)))
        jax.block_until_ready(f2(jax.random.key(0)))
        fns[tag] = (f1, f2, [])
    for i in range(5):
        for tag, (f1, f2, ds) in fns.items():
            t1 = timed(f1, jax.random.key(i)); t2 = timed(f2, jax.random.key(i))
            ds.append((t2-t1)/8)
    r = {tag: rows/float(np.median(ds))/1e6 for tag, (_,_,ds) in fns.items()}
    print(f"d={d} h={hidden}: fused {r['fused']:.1f} M vs jnp {r['jnp']:.1f} M "
          f"(ratio {r['fused']/r['jnp']:.2f}x)", flush=True)
