"""(a) remat at large batch; (b) MFU vs hidden width — joint mp config."""
import time, numpy as np, jax, jax.numpy as jnp, optax
import densityflows_tpu as df
from densityflows_tpu.train import make_train_step
from densityflows_tpu.ops.mlp import MLP

d, n_cond, n_blocks = 32, 8, 4
peak = 197e12
rng = np.random.default_rng(0)
x_ref = rng.normal(size=(512, d)).astype(np.float32)
base = df.StandardNormal(d)
jax.block_until_ready(jnp.zeros(1)+1)

def build(hidden):
    keys = jax.random.split(jax.random.key(0), n_blocks)
    return df.flow_chain(
        *[df.coupling_block(d, None, n=n_cond, key=k, hidden_dim_s=hidden,
                            hidden_dim_t=hidden, joint_conditioner=True)
          for k in keys],
        df.normalization_layer(x_ref, -1.0, 1.0))

def flops(model):
    nodes = jax.tree_util.tree_flatten(model, is_leaf=lambda n: isinstance(n, MLP))[0]
    return sum(2*int(np.prod(w.shape)) for n in nodes if isinstance(n, MLP) for w in n.weights)

def timed(f, *a):
    t0=time.perf_counter(); jax.block_until_ready(f(*a)); return time.perf_counter()-t0

CASES = [
    ("h256_b8k", 256, 8192, False),
    ("h256_b32k", 256, 32768, False),
    ("h256_b32k_remat", 256, 32768, True),
    ("h512_b8k", 512, 8192, False),
    ("h1024_b8k", 1024, 8192, False),
]
variants = {}
for tag, hidden, batch, remat in CASES:
    opt = optax.adam(1e-3)
    step = make_train_step(opt, mixed_precision=True, remat=remat)
    model = build(hidden)
    x = jnp.asarray(rng.normal(size=(batch, d)).astype(np.float32))
    th = jnp.asarray(rng.uniform(0, 1, size=(batch, n_cond)).astype(np.float32))
    mask = jnp.ones((batch,), jnp.float32)
    def mk(k, step=step, x=x, th=th, mask=mask):
        @jax.jit
        def run(m, o):
            def body(c, _):
                mm, oo = c
                mm, oo, loss = step(mm, oo, base, x, th, mask)
                return (mm, oo), loss
            (mm, oo), L = jax.lax.scan(body, (m, o), None, length=k)
            return L[-1]
        return run
    K1, K2 = 8, 40
    f1, f2 = mk(K1), mk(K2)
    o = opt.init(model)
    jax.block_until_ready(f1(model, o)); jax.block_until_ready(f2(model, o))
    variants[tag] = (f1, f2, model, o, [], batch, flops(model), K1, K2)
for i in range(6):
    for tag, (f1, f2, m, o, ds, *_rest) in variants.items():
        t1 = timed(f1, m, o); t2 = timed(f2, m, o)
        ds.append((t2-t1)/32)
for tag, (_,_,_,_,ds,batch,fl,K1,K2) in variants.items():
    t = float(np.median(ds))
    sps = batch/t
    print(tag, "| ms/step", round(t*1e3,3), "| Msps", round(sps/1e6,2),
          "| MFU", round(sps*3*fl/peak, 4), flush=True)
