"""Out-of-core streaming input pipeline + streaming trainer.

The fused-program path (:func:`densityflows_tpu.train.train`) uploads the
whole dataset to HBM once — right for datasets that fit. This module is
the path for datasets that don't: a host-side loader that assembles
shuffled batches from a (possibly memory-mapped) array with the native
threaded gather (``native/loader.cpp``), double-buffers them on a
background thread, and feeds the per-batch jitted train step
(:func:`~densityflows_tpu.train.make_train_step`) so host assembly of
batch k+1 overlaps device compute of batch k.

No reference counterpart: DensityFlows.jl's ``Flux.DataLoader`` shuffles
an in-memory array (/root/reference/src/Flows.jl:394) and has no
streaming or multi-host story. Epoch semantics match the reference
(fresh shuffle per epoch, partial final batch kept via mask, per-epoch
train/valid NLL pushed to the histories, src/Flows.jl:419-437).

Multi-host: pass ``host_id``/``num_hosts`` and each host streams its own
disjoint row shard of the SAME deterministic global permutation —
per-host loading with global-shuffle equivalence (SURVEY.md §7
"Multi-host input pipeline + determinism").
"""

from __future__ import annotations

import queue
import threading

import jax
import jax.numpy as jnp
import numpy as np

from . import native

__all__ = ["StreamingLoader", "train_streaming"]


_mask_sum = jax.jit(jnp.sum)


class StreamingLoader:
    """Deterministic, double-buffered batch loader over host arrays.

    ``x`` (n, d) and optional ``theta`` (n, k) may be NumPy arrays or
    memmaps (``np.load(..., mmap_mode='r')``). Iterating an epoch yields
    ``(x_batch, theta_batch, mask)`` with static shapes; the mask zeroes
    padded rows of the final partial batch.
    """

    def __init__(
        self,
        x,
        theta=None,
        *,
        batchsize: int = 64,
        shuffle: bool = True,
        seed: int = 0,
        host_id: int = 0,
        num_hosts: int = 1,
        prefetch: int = 2,
    ):
        if x.ndim != 2:
            raise ValueError(f"x must be (rows, d), got shape {x.shape}")
        if theta is None:
            theta = np.zeros((x.shape[0], 0), np.float32)
        if theta.shape[0] != x.shape[0]:
            raise ValueError(
                f"x has {x.shape[0]} rows but theta has {theta.shape[0]}"
            )
        if not (0 <= host_id < num_hosts):
            raise ValueError(f"host_id {host_id} not in [0, {num_hosts})")
        self.x, self.theta = x, theta
        self.batchsize = int(batchsize)
        self.shuffle = bool(shuffle)
        self.seed = int(seed)
        self.host_id, self.num_hosts = int(host_id), int(num_hosts)
        self.prefetch = int(prefetch)
        self._epoch = 0

    @property
    def _rows_per_host_padded(self) -> int:
        # ceil split: every host is sized for the SAME padded row count,
        # so every host runs the SAME number of batches per epoch —
        # unequal step counts would deadlock SPMD collectives the moment
        # this loader composes with a mesh (hosts with fewer real rows
        # emit fully-masked padding batches instead)
        return -(-self.x.shape[0] // self.num_hosts)

    @property
    def rows_per_host(self) -> int:
        # REAL rows this host holds (its contiguous ceil-split chunk of
        # the global permutation; late hosts may hold fewer)
        n = self.x.shape[0]
        per = self._rows_per_host_padded
        lo = min(self.host_id * per, n)
        return min(lo + per, n) - lo

    @property
    def batches_per_epoch(self) -> int:
        # identical on every host (lockstep invariant)
        return -(-self._rows_per_host_padded // self.batchsize)

    def _epoch_order(self, epoch: int) -> np.ndarray:
        n = self.x.shape[0]
        if self.shuffle:
            order = native.shuffle(self.seed * 0x9E3779B9 + epoch + 1, n)
        else:
            order = np.arange(n, dtype=np.int64)
        per = self._rows_per_host_padded
        lo = min(self.host_id * per, n)
        hi = min(lo + per, n)
        return order[lo:hi]

    def _assemble(self, idx: np.ndarray):
        b = self.batchsize
        k = len(idx)
        mask = np.zeros((b,), np.float32)
        mask[:k] = 1.0
        if k < b:
            idx = np.concatenate([idx, np.zeros((b - k,), np.int64)])
        return (
            native.gather_rows(self.x, idx),
            native.gather_rows(self.theta, idx),
            mask,
        )

    def epoch(self, epoch: int | None = None):
        """Iterate one epoch's batches, assembled on a background thread."""
        if epoch is None:
            epoch = self._epoch
            self._epoch += 1
        order = self._epoch_order(epoch)
        # iterate the PADDED range so every host yields the same batch
        # count; starts beyond this host's real rows give all-masked
        # batches (order[s:s+b] is empty → mask all zeros)
        starts = range(0, self._rows_per_host_padded, self.batchsize)
        q: queue.Queue = queue.Queue(maxsize=max(1, self.prefetch))
        sentinel = object()

        def producer():
            try:
                for s in starts:
                    q.put(self._assemble(order[s : s + self.batchsize]))
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()

    def __iter__(self):
        return self.epoch()


def train_streaming(
    flow,
    x,
    theta=None,
    optimizer=None,
    opt_state=None,
    *,
    epochs: int = 10,
    batchsize: int = 64,
    shuffle: bool = True,
    seed: int = 0,
    valid_data: tuple | None = None,
    verbose: bool = True,
    host_id: int | None = None,
    num_hosts: int | None = None,
    mesh=None,
    metrics_log: str | None = None,
):
    """Stream-train a flow from host (possibly memory-mapped) arrays.

    θ is normalized per-batch via the flow's metadata (same boundary
    contract as ``train``, src/Flows.jl:391-392); raw arrays stay on the
    host. ``valid_data = (x_valid, theta_valid)`` (raw, un-normalized)
    adds a per-epoch validation NLL. Returns ``opt_state``.

    ``mesh``: shard each batch over the mesh ``data`` axis — the gradient
    psum is inserted by GSPMD, so streaming composes with DP. On a
    multi-process mesh each host streams ITS OWN loader shard
    (``host_id``/``num_hosts`` default to the process index/count) and
    the global batch of ``batchsize × num_hosts`` rows is assembled with
    ``jax.make_array_from_process_local_data``; the loader's ceil-split
    guarantees every host runs the SAME batch count per epoch (lockstep —
    unequal step counts would deadlock the psum).
    """
    from .data import normalize_input
    from .train import make_train_step, _default_adam, _eval_nll_jit

    multiproc = mesh is not None and jax.process_count() > 1
    if host_id is None:
        host_id = jax.process_index() if multiproc else 0
    if num_hosts is None:
        num_hosts = jax.process_count() if multiproc else 1
    if multiproc and num_hosts != jax.process_count():
        raise ValueError(
            f"on a multi-process mesh num_hosts ({num_hosts}) must equal "
            f"jax.process_count() ({jax.process_count()})"
        )

    if optimizer is None:
        optimizer = _default_adam()
    step = make_train_step(optimizer)
    # fused streaming step (r5): on a single TPU with an Adam-family
    # optimizer inside the step-kernel envelope, the per-batch step runs
    # the grads-only kernel + folded Adam (3.4×/1.6× the jnp step at
    # ref/medium configs — design.md §14c). The loop below is unchanged:
    # `model`/`opt_state` carry the FOLDED representation, and `fused`
    # translates at entry/exit.
    fused = _fused_streaming_setup(flow, optimizer, opt_state, mesh)
    fused_carrier = None
    if fused is not None:
        # fold BEFORE any multi-process replication of model/opt_state
        fused_carrier = fused["enter"](flow.model, opt_state)
        if fused_carrier is None:
            fused = None
    loader = StreamingLoader(
        x, theta, batchsize=batchsize, shuffle=shuffle, seed=seed,
        host_id=host_id, num_hosts=num_hosts,
    )

    batch_sharding = mask_sharding = None
    if mesh is not None:
        from .parallel.mesh import data_sharding, put_replicated

        batch_sharding = data_sharding(mesh, 2)
        mask_sharding = data_sharding(mesh, 1)
        if multiproc and fused is None:
            # the fused path folds the HOST-LOCAL model/state and lifts
            # the folded lists itself (enter())
            flow.model = put_replicated(mesh, flow.model)
            if opt_state is not None:
                opt_state = put_replicated(mesh, opt_state)

    def place(arr, sharding):
        arr = np.ascontiguousarray(arr)
        if sharding is None:
            return jnp.asarray(arr)
        if multiproc:
            return jax.make_array_from_process_local_data(sharding, arr)
        return jax.device_put(arr, sharding)

    model = flow.model
    if fused is not None:
        model, opt_state = fused_carrier
        step = fused["step"]
        flow.trained_path = ("fused-step-mesh" if mesh is not None
                             else "fused-step")
    elif opt_state is None:
        opt_state = optimizer.init(model)
    md = flow.metadata

    def norm_theta(th):
        return normalize_input(th, md.theta_min, md.theta_max)

    xv = thv = None
    if valid_data is not None:
        xv = jnp.asarray(valid_data[0])
        thv_raw = valid_data[1]
        if thv_raw is None:
            thv_raw = np.zeros((valid_data[0].shape[0], 0), np.float32)
        thv = jnp.asarray(norm_theta(np.asarray(thv_raw)))

    logger = None
    if metrics_log is not None:
        from .utils.logging import MetricsLogger

        logger = MetricsLogger(metrics_log)

    eval_nll = fused["eval"] if fused is not None else _eval_nll_jit
    for e in range(epochs):
        losses, weights = [], []
        for xb, thb, mask in loader.epoch(e):
            mask_g = place(mask, mask_sharding)
            model, opt_state, loss = step(
                model, opt_state, flow.base,
                place(xb, batch_sharding),
                place(norm_theta(thb), batch_sharding),
                mask_g,
            )
            # keep losses on device — a float() here would sync per batch
            # and serialize host assembly against device compute
            losses.append(loss)
            if multiproc:
                # the loss is the GLOBAL masked NLL (psum'd in-program), so
                # the epoch weighting needs the GLOBAL mask sum
                weights.append(_mask_sum(mask_g))
            else:
                weights.append(float(mask.sum()))
        if multiproc:
            weights = [float(np.asarray(w)) for w in weights]
        w = np.asarray(weights)
        train_nll = float(np.dot(np.asarray(losses), w) / max(w.sum(), 1.0))
        if fused is None:
            flow.model = model  # folded carriers unfold once at exit
        flow.train_loss.append(train_nll)
        extras = {}
        if xv is not None:
            vl = float(eval_nll(model, flow.base, xv, thv))
            flow.valid_loss.append(vl)
            extras["valid_nll"] = vl
        if logger is not None:
            logger.write(epoch=len(flow.train_loss), train_nll=train_nll,
                         **extras)
        if verbose:
            msg = f"epoch: {len(flow.train_loss)} | train_loss = {train_nll}"
            if xv is not None:
                msg += f", valid_loss = {extras['valid_nll']}"
            print(msg)
    if fused is not None:
        model, opt_state = fused["exit"](model, opt_state)
        flow.model = model
    return opt_state


def _fused_streaming_setup(flow, optimizer, opt_state, mesh=None):
    """``None``, or enter/step/eval/exit callables that run the
    streaming loop on FOLDED params with the grads-only step kernel
    (``ops/pallas_step``) + optax Adam. On a mesh the per-batch step is
    the shard_map DP step (local kernel → grad psum → folded Adam,
    ``train.make_fused_step_fn``) and works multi-process (fold
    host-local, lift to replicated global arrays). Adam-family, inside
    the measured envelope only (design.md §14c)."""
    import numpy as np
    import optax

    from .models.fused_train import (
        _STEP_MAX_D,
        _STEP_MAX_LOCAL_BATCH,
        _STEP_MAX_WIDTH,
        UnsupportedFusedTrain,
        chain_train_fold,
    )
    from .train import Adam, _default_adam

    if jax.default_backend() != "tpu":
        return None
    if type(optimizer) is Adam:
        hp = dict(learning_rate=optimizer.learning_rate, b1=optimizer.b1,
                  b2=optimizer.b2, eps=optimizer.eps)
    elif optimizer is _default_adam():
        hp = dict(learning_rate=1e-3, b1=0.9, b2=0.999, eps=1e-8)
    else:
        return None
    if opt_state is not None and not (
            hasattr(opt_state[0], "mu") and hasattr(opt_state[0], "nu")):
        return None
    if flow.metadata.d > _STEP_MAX_D:
        return None
    try:
        (plan, tcounts, tparams, masks, mask_slots, cparams, fold_state,
         unfold) = chain_train_fold(flow.model)
    except UnsupportedFusedTrain:
        return None
    width = max([int(p.shape[-1]) for p in tparams
                 if getattr(p, "ndim", 0) == 2] + [1])
    if width > _STEP_MAX_WIDTH:
        return None
    multiproc = mesh is not None and jax.process_count() > 1

    from .ops.pallas_step import folded_nll, run_fused_grads

    tx = optax.adam(**hp)
    # real platform, not default_backend (tests monkeypatch the latter
    # to exercise routing on the CPU rig)
    interpret = jax.devices()[0].platform != "tpu"

    if mesh is not None:
        from .train import make_fused_step_fn

        ndev = int(dict(mesh.shape).get("data", 1))
        if any(sz > 1 for name, sz in dict(mesh.shape).items()
               if name != "data"):
            return None
        mesh_step = make_fused_step_fn(
            mesh, plan, tuple(tcounts), tuple(masks), tuple(mask_slots),
            tuple(cparams), lr=hp["learning_rate"], b1=hp["b1"],
            b2=hp["b2"], eps=hp["eps"], interpret=interpret)

        def step(tp, fstate, base_stub, xb, thb, mask):
            del base_stub
            if xb.shape[0] % ndev or xb.shape[0] // ndev \
                    > _STEP_MAX_LOCAL_BATCH:
                raise ValueError(
                    f"streaming fused-step: global batch {xb.shape[0]} "
                    f"must divide the data axis ({ndev}) and keep the "
                    f"per-device batch ≤ {_STEP_MAX_LOCAL_BATCH}")
            return mesh_step(tp, fstate, xb, thb, mask)
    else:
        @jax.jit
        def step(tp, fstate, base_stub, xb, thb, mask):
            del base_stub
            loss, grads = run_fused_grads(
                xb, thb, mask, tuple(tp), tuple(masks), tuple(cparams),
                plan=plan, tcounts=tuple(tcounts),
                mask_slots=tuple(mask_slots),
                tile=min(512, xb.shape[0]), interpret=interpret)
            upd, fstate = tx.update(list(grads), fstate, list(tp))
            return tuple(p + u for p, u in zip(tp, upd)), fstate, loss

    @jax.jit
    def eval_nll(tp, base_stub, xv, thv):
        del base_stub
        ones = jnp.ones((xv.shape[0], 1), jnp.float32)
        return folded_nll(list(tp), list(cparams), xv, thv, ones,
                          plan=plan, tcounts=tuple(tcounts))

    def enter(model, user_state):
        fstate = tx.init(list(tparams))
        tp = tuple(tparams)
        if user_state is not None:
            adam = user_state[0]
            try:
                fstate = (fstate[0]._replace(
                    count=jnp.asarray(adam.count, jnp.int32),
                    mu=fold_state(adam.mu),
                    nu=fold_state(adam.nu),
                ),) + tuple(fstate[1:])
            except Exception:
                # non-addressable state cannot fold eagerly — caller
                # falls back to the jnp step path
                return None
        if multiproc:
            from .parallel.mesh import put_replicated

            tp = put_replicated(mesh, tp)
            fstate = put_replicated(mesh, fstate)
        return tp, fstate

    def _to_host(arrs):
        if multiproc:
            return [jnp.asarray(np.asarray(a.addressable_data(0)))
                    for a in arrs]
        return list(arrs)

    def exit_(tp, fstate):
        new_model = unfold(_to_host(tp))

        def zero_tpl():
            return jax.tree_util.tree_map(jnp.zeros_like, new_model)

        ref_state = tx.init(new_model)
        count_out = fstate[0].count
        if multiproc:
            count_out = jnp.asarray(
                np.asarray(count_out.addressable_data(0)))
        new0 = ref_state[0]._replace(
            count=count_out,
            mu=unfold(_to_host(fstate[0].mu), zero_tpl()),
            nu=unfold(_to_host(fstate[0].nu), zero_tpl()),
        )
        return new_model, (new0,) + tuple(ref_state[1:])

    return {"enter": enter, "step": step, "eval": eval_nll,
            "exit": exit_}
