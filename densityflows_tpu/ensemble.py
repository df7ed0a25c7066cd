"""Deep-ensemble flows: K members trained in ONE vmapped fused program.

TPU-idiomatic uncertainty quantification with no reference counterpart:
instead of training K flows in a Python loop (K compiles, K dispatches),
the member axis is a *batch axis of the program itself* — parameters are
stacked leaf-wise, ``jax.vmap`` maps the whole multi-epoch fused train
program (train.py ``make_train_program``) over them, and XLA compiles one
program whose matmuls carry a leading K dimension (batched onto the MXU).
Members see the same data but independent shuffle streams and independent
inits, which is exactly the deep-ensembles recipe (Lakshminarayanan et
al. 2017).

The resulting :class:`EnsembleFlow` is a uniform mixture:
``log_prob = logsumexp_k log p_k(x|θ) − log K``; epistemic uncertainty is
read off the member spread (``log_prob_members``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .models.flow import Flow
from .data import DataArrays

__all__ = ["EnsembleFlow", "train_ensemble", "stack_models"]


def stack_models(models):
    """Stack identically-structured pytrees leaf-wise along a new leading
    member axis. All members must share static structure (same axes/
    masks/activations) — i.e. be built by the same factory with different
    keys."""
    if len(models) < 1:
        raise ValueError("need at least one model")
    treedefs = {str(jax.tree_util.tree_structure(m)) for m in models}
    if len(treedefs) != 1:
        raise ValueError(
            "ensemble members must share one pytree structure (same "
            "factory, different keys). Note layers whose STATIC aux data "
            "is key-dependent (e.g. invertible_linear_layer's LU pivots, "
            "random permutation_layer) must be built with one shared key "
            "across members — vary only the conditioner keys."
        )
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *models)


def _member(stacked, i):
    return jax.tree_util.tree_map(lambda l: l[i], stacked)


class EnsembleFlow:
    """Uniform mixture of K flows sharing one base + θ-metadata.

    ``model`` holds the stacked parameters (leading member axis K).
    """

    def __init__(self, stacked_model, metadata, base, n_members: int,
                 train_loss=None, valid_loss=None):
        self.model = stacked_model
        self.metadata = metadata
        self.base = base
        self.n_members = int(n_members)
        # per-member histories: (K, epochs) lists
        self.train_loss = train_loss if train_loss is not None else []
        self.valid_loss = valid_loss if valid_loss is not None else []
        self._proto = Flow(_member(stacked_model, 0), metadata, base)

    def member(self, i: int) -> Flow:
        """Extract member i as a standalone :class:`Flow`."""
        f = Flow(_member(self.model, i), self.metadata, self.base)
        if len(self.train_loss):
            f.train_loss = [row[i] for row in self.train_loss]
        if len(self.valid_loss):
            f.valid_loss = [row[i] for row in self.valid_loss]
        return f

    def log_prob_members(self, x, theta=None):
        """(K, batch...) per-member log densities — the spread across the
        member axis is the epistemic-uncertainty signal."""
        x = jnp.asarray(x)
        theta_n = self._proto.prepare_theta(theta, x.shape[:-1])

        def one(model):
            z, ldj = model.inverse(x, theta_n)
            return self.base.log_prob(z) + ldj

        return jax.vmap(one)(self.model)

    def log_prob(self, x, theta=None):
        """Mixture log density: logsumexp over members − log K."""
        lp = self.log_prob_members(x, theta)
        return jax.scipy.special.logsumexp(lp, axis=0) - jnp.log(self.n_members)

    def prob(self, x, theta=None):
        return jnp.exp(self.log_prob(x, theta))

    def sample(self, dims, theta=None, *, key=None, dtype=jnp.float32):
        """Stratified mixture sampling: ⌈n/K⌉ draws per member (one
        vmapped program), flattened and truncated to ``prod(dims)`` in a
        random interleaving."""
        if key is None:
            key = jax.random.key(np.random.randint(0, 2**31 - 1))
        dims = (dims,) if isinstance(dims, int) else tuple(dims)
        n = int(np.prod(dims))
        per = -(-n // self.n_members)
        k_draw, k_mix = jax.random.split(key)
        theta_n = self._proto.prepare_theta(theta, (per,), dtype)
        r = self.base.sample(k_draw, (self.n_members, per), dtype)

        def one(model, r_m):
            return model.forward_(r_m, theta_n)

        draws = jax.vmap(one)(self.model, r)          # (K, per, d)
        flat = draws.reshape(self.n_members * per, -1)
        take = jax.random.permutation(k_mix, flat.shape[0])[:n]
        return flat[take].reshape(dims + (flat.shape[-1],))

    def summarize(self) -> str:
        return (
            f"EnsembleFlow | {self.n_members} members\n"
            + self._proto.model.summarize()
        )


def train_ensemble(
    factory,
    data: DataArrays,
    *,
    n_members: int = 5,
    optimizer=None,
    epochs: int = 100,
    batchsize: int = 64,
    shuffle: bool = True,
    key=None,
    base=None,
    verbose: bool = True,
    mesh=None,
) -> EnsembleFlow:
    """Build and train K flows as one vmapped fused program.

    ``factory(key) -> model chain`` builds one member (independent init);
    all members must share static structure. Returns an
    :class:`EnsembleFlow` with per-member loss histories.

    ``mesh``: shard the MEMBER axis over the mesh ``data`` axis — members
    are independent, so ensemble training is embarrassingly parallel:
    each device trains its share of members with ZERO collectives (the
    dataset is replicated). Requires ``n_members`` divisible by the mesh
    ``data`` size; single-host meshes only (members are placed with
    ``device_put``).
    """

    from .train import make_train_program, _default_adam

    if optimizer is None:
        optimizer = _default_adam()
    if key is None:
        key = jax.random.key(np.random.randint(0, 2**31 - 1))
    k_init, k_train = jax.random.split(key)

    members = [factory(k) for k in jax.random.split(k_init, n_members)]
    stacked = stack_models(members)
    proto = Flow(members[0], data.metadata(), base)

    x_train, th_train = data.normalized_training_data(proto.metadata)
    x_valid, th_valid = data.normalized_validation_data(proto.metadata)
    n_train, n_valid = x_train.shape[0], x_valid.shape[0]

    program = make_train_program(
        optimizer, batchsize, epochs, shuffle,
        n_train=n_train, n_valid=n_valid, pure=True,
    )
    opt_states = jax.vmap(optimizer.init)(stacked)
    keys = jax.random.split(k_train, n_members)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        m = mesh.shape["data"]
        if n_members % m:
            raise ValueError(
                f"n_members ({n_members}) must be a multiple of the mesh "
                f"data axis ({m}) to shard the member axis"
            )

        def member_sharded(tree):
            return jax.tree_util.tree_map(
                lambda l: jax.device_put(
                    l, NamedSharding(mesh, P("data", *[None] * (l.ndim - 1)))
                ),
                tree,
            )

        stacked = member_sharded(stacked)
        opt_states = member_sharded(opt_states)
        keys = member_sharded(keys)

    # member axis: params/opt-state/keys mapped, data/base broadcast
    ens_program = jax.jit(
        jax.vmap(program, in_axes=(0, 0, None, None, None, None, None, 0)),
        donate_argnums=(0, 1),
    )
    stacked, opt_states, tls, vls = ens_program(
        stacked, opt_states, proto.base,
        jnp.asarray(x_train), jnp.asarray(th_train),
        jnp.asarray(x_valid), jnp.asarray(th_valid), keys,
    )
    tls = np.asarray(tls)  # (K, epochs)
    vls = np.asarray(vls)

    ens = EnsembleFlow(
        stacked, proto.metadata, proto.base, n_members,
        train_loss=[list(map(float, tls[:, e])) for e in range(epochs)],
        valid_loss=[list(map(float, vls[:, e])) for e in range(epochs)],
    )
    if verbose:
        print(
            f"[ensemble x{n_members}] final train NLL per member: "
            + ", ".join(f"{v:.4f}" for v in tls[:, -1])
        )
    return ens
