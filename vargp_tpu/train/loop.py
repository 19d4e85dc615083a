"""Task-level training loop for VARGP.

Parity: experiments/vargp.py:14-73 — per-task model construction, Yogi
optimizer, ELBO assembly beta*kl_hypers + kl_u + (N/B)*nll, eval every
``eval_interval`` epochs, early stopping on val accuracy, best-checkpoint
return.

TPU-first: one jitted update per (task, batch-shape) — static shapes via
padded batches; params/opt_state donated; PRNG keys threaded host-side.
"""

import time
from dataclasses import dataclass, replace
from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vargp_tpu import gpmath
from vargp_tpu.data.core import ArrayDataset, batch_iter
from vargp_tpu.models import vargp as V
from vargp_tpu.train.metrics import compute_accuracy
from vargp_tpu.train.stopper import EarlyStopper


@dataclass(frozen=True)
class TrainHyperparams:
    epochs: int = 1
    lr: float = 1e-2
    batch_size: int = 512
    beta: float = 1.0
    eval_interval: int = 10
    patience: int = 20
    optimizer: str = "yogi"  # matches torch_optimizer.Yogi (vargp.py:23)
    eval_n_f: int | None = None
    eval_n_var_samples: int | None = None
    # one scanned device program per epoch (vs one dispatch per minibatch);
    # identical math, large win when host->device dispatch is expensive
    scan_epoch: bool = True
    # padded-chain compilation: fix the chain length (pad_tasks_to) and the
    # padded dataset / eval-stack sizes so ONE compiled program serves every
    # task of a continual run (exact math; see models.vargp.pad_chain)
    pad_tasks_to: int | None = None
    pad_data_rows: int | None = None
    pad_eval_batches: int | None = None
    # upper bound on optimizer steps per device dispatch: bounds single-
    # execution time (remote/tunneled TPUs kill very long dispatches) and
    # compile memory for large models
    max_steps_per_dispatch: int = 128
    # reference semantics re-sample theta (and the AR posterior with it)
    # for every eval batch (train_utils.py:24-28); default shares one
    # posterior across the whole eval scan — same MC estimator, one
    # Gram+Cholesky per dataset instead of per batch
    eval_resample_per_batch: bool = False
    # DKL feature-map (phi) optimizer group: separate peak lr (None = hp.lr),
    # decoupled weight decay, and freeze-after-first-task (tasks > 0 train
    # with phi update scale 0 — a runtime value in opt_state, so the padded-
    # chain one-compile property is preserved).  The reference trains phi
    # with the single shared optimizer (vargp.py:219-235); these knobs exist
    # for the DKL stability ablation (no effect unless set).
    phi_lr: float | None = None
    phi_weight_decay: float = 0.0
    freeze_phi_after_first: bool = False


class PhiScaleState(NamedTuple):
    """Runtime multiplier on phi updates (1.0 = train, 0.0 = frozen)."""

    scale: jax.Array


def _phi_update_scale() -> optax.GradientTransformation:
    """Final transform scaling phi updates by a value carried in opt_state.

    The scale is data, not program: flipping it between tasks (see
    set_phi_update_scale) does not recompile the shared train block."""

    def init(params):
        del params
        return PhiScaleState(scale=jnp.asarray(1.0, jnp.float32))

    def update(updates, state, params=None):
        del params
        phi = getattr(updates, "phi", None)
        if phi is not None:
            updates = updates._replace(
                phi=jax.tree_util.tree_map(lambda u: u * state.scale, phi)
            )
        return updates, state

    return optax.GradientTransformation(init, update)


def set_phi_update_scale(opt_state, value: float):
    """Return opt_state with every PhiScaleState set to ``value``."""
    return jax.tree_util.tree_map(
        lambda s: PhiScaleState(scale=jnp.full_like(s.scale, value))
        if isinstance(s, PhiScaleState)
        else s,
        opt_state,
        is_leaf=lambda s: isinstance(s, PhiScaleState),
    )


def _phi_mask(params):
    """Boolean pytree marking the DKL feature-map leaves."""
    mask = jax.tree_util.tree_map(lambda _: False, params)
    phi = getattr(params, "phi", None)
    if phi is not None:
        mask = mask._replace(
            phi=jax.tree_util.tree_map(lambda _: True, phi)
        )
    return mask


def make_optimizer(hp: TrainHyperparams) -> optax.GradientTransformation:
    if hp.optimizer == "yogi":
        inner = optax.scale_by_yogi()
    elif hp.optimizer == "adam":
        inner = optax.scale_by_adam()
    else:
        raise ValueError(f"unknown optimizer {hp.optimizer!r}")
    phi_grouped = (
        hp.phi_lr is not None
        or hp.phi_weight_decay
        or hp.freeze_phi_after_first
    )
    if not phi_grouped:
        # exact historical path (optax.yogi/adam == scale_by_* + lr); kept
        # so default opt_state structures match existing checkpoints
        if hp.optimizer == "yogi":
            return optax.yogi(hp.lr)
        return optax.adam(hp.lr)
    parts = [inner]
    if hp.phi_weight_decay:
        # decoupled (AdamW-style): applied after the preconditioner,
        # before the lr scaling, phi leaves only
        parts.append(
            optax.masked(
                optax.add_decayed_weights(hp.phi_weight_decay), _phi_mask
            )
        )
    parts.append(optax.scale_by_learning_rate(hp.lr))
    if hp.phi_lr is not None and hp.phi_lr != hp.lr:
        parts.append(optax.masked(optax.scale(hp.phi_lr / hp.lr), _phi_mask))
    if hp.freeze_phi_after_first:
        parts.append(_phi_update_scale())
    return optax.chain(*parts)


def elbo_step(
    params, opt_state, prev, prior, x, y, w, key, *,
    cfg: V.VARGPConfig, tx, beta: float, n_train, chain_mask=None,
):
    """THE optimizer step: ELBO grad + optimizer update.

    Single source of truth for the update math — every update builder
    (per-batch, scanned device block, sharded) wraps this function, so the
    sharded/padded variants cannot drift from the plain one.
    Parity: experiments/vargp.py:34-37 (loss assembly + backward + step).
    """

    def total_loss(p):
        klh, klu, nll = V.loss(
            p, prev, prior, x, y, key, cfg, weights=w, chain_mask=chain_mask
        )
        scale = n_train / jnp.maximum(jnp.sum(w), 1.0)
        return beta * klh + klu + scale * nll, (klh, klu, nll)

    (loss_val, aux), grads = jax.value_and_grad(total_loss, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss_val, aux


def make_update_fn(cfg: V.VARGPConfig, tx, beta: float, n_train: int):
    """Jitted per-batch ELBO step. prev/prior ride as pytree args so one
    compiled program serves the whole task."""

    @partial(jax.jit, donate_argnums=(0, 1))
    def update(params, opt_state, prev, prior, x, y, w, key, chain_mask=None):
        return elbo_step(
            params, opt_state, prev, prior, x, y, w, key,
            cfg=cfg, tx=tx, beta=beta, n_train=n_train, chain_mask=chain_mask,
        )

    return update


def _train_tril_layout() -> str:
    """Packing layout used INSIDE scanned train blocks.  Default "filled"
    (gather-free unpack, gpmath.tril_from_filled; bit-exact vs rowmajor —
    tested).  VARGP_TPU_TRIL_LAYOUT=rowmajor reverts; unknown values raise
    (a typo must not silently change the compiled program)."""
    import os

    v = os.environ.get("VARGP_TPU_TRIL_LAYOUT", "filled")
    if v not in ("filled", "rowmajor"):
        raise ValueError(
            f"VARGP_TPU_TRIL_LAYOUT={v!r}: expected 'filled' or 'rowmajor'"
        )
    return v


def _map_u_tril_leaves(tree, fn):
    """Apply ``fn`` to every leaf whose pytree path ends in u_tril_vec —
    the param itself and its mirrored optimizer moments."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    leaves = [
        fn(leaf) if jax.tree_util.keystr(path).endswith("u_tril_vec") else leaf
        for path, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def make_device_train_fn(
    cfg: V.VARGPConfig,
    tx,
    beta: float,
    batch_size: int,
    n_epochs: int,
    mesh=None,
):
    """Fully on-device training block: the task dataset lives in HBM once;
    shuffling (jax.random.permutation), batching (dynamic row gather) and
    ``n_epochs`` of updates all run inside ONE compiled program.

    This is the production path between evaluations: zero per-epoch host
    transfers and one dispatch per eval interval.  The dataset must be
    padded to a multiple of batch_size with zero-weight rows.

    With ``mesh`` (a ("data","model") jax.sharding.Mesh) the same program
    runs GSPMD-sharded: the dataset stays replicated (small — tens of MB),
    each gathered minibatch is constrained to be batch-sharded over "data",
    and params/moments keep their class-axis "model" sharding from their
    input placement; XLA inserts the psum-style gradient reduction and the
    class-axis all-gather at the softmax.
    """
    if mesh is not None:
        from vargp_tpu.parallel.mesh import batch_shardings

        batch_sh = batch_shardings(mesh)

    # Inside the scanned block the packed scale factor rides in the
    # gather-free "filled" layout (gpmath.tril): the rowmajor<->filled
    # permutations run ONCE per dispatch (amortized over
    # n_epochs * steps_per_epoch optimizer steps) instead of the per-step
    # unpack gather + pack scatter (14 ms/step at M=1024 on v5e).  The
    # permutation is along the unsharded packed axis, so it is shard-local
    # under the ("data","model") mesh.  Optimizer moments mirror the param
    # pytree and permute identically; Yogi/Adam are elementwise, so the
    # trajectory is bit-exact vs the rowmajor path (tested).
    layout = _train_tril_layout()
    cfg_in = replace(cfg, tril_layout=layout) if layout != cfg.tril_layout else cfg
    # boundary conversions fire only on an ACTUAL layout transition: params
    # already stored in the block's layout (cfg.tril_layout == layout) must
    # pass through untouched — permuting them again would scramble the
    # packed factor (softplus applied to off-diagonal entries) silently
    _entry_perm = _exit_perm = None
    if cfg.tril_layout == "rowmajor" and layout == "filled":
        _entry_perm = lambda v: gpmath.rowmajor_to_filled(v, cfg.M)
        _exit_perm = lambda v: gpmath.filled_to_rowmajor(v, cfg.M)
    elif cfg.tril_layout == "filled" and layout == "rowmajor":
        _entry_perm = lambda v: gpmath.filled_to_rowmajor(v, cfg.M)
        _exit_perm = lambda v: gpmath.rowmajor_to_filled(v, cfg.M)

    @partial(jax.jit, donate_argnums=(0, 1))
    def run(params, opt_state, prev, prior, chain_mask, n_train,
            data_x, data_y, data_w, key):
        if _entry_perm is not None:
            params = _map_u_tril_leaves(params, _entry_perm)
            opt_state = _map_u_tril_leaves(opt_state, _entry_perm)
        n_pad = data_x.shape[0]
        steps_per_epoch = n_pad // batch_size

        # one FLAT scan over all steps (nested epoch/step scans at large
        # model sizes produce programs big enough to crash the compiler);
        # per-epoch shuffles are precomputed as a (n_epochs, n_pad) table
        perm_keys = jax.vmap(lambda e: jax.random.fold_in(key, e))(
            jnp.arange(n_epochs)
        )
        perms = jax.vmap(lambda k: jax.random.permutation(k, n_pad))(perm_keys)

        def step(carry, s):
            params, opt_state = carry
            e = s // steps_per_epoch
            o = (s % steps_per_epoch) * batch_size
            idx = jax.lax.dynamic_slice(perms[e], (o,), (batch_size,))
            x, y, w = data_x[idx], data_y[idx], data_w[idx]
            if mesh is not None:
                x, y, w = jax.lax.with_sharding_constraint(
                    (x, y, w), batch_sh
                )
            k = jax.random.fold_in(key, n_epochs + s)
            params, opt_state, loss_val, aux = elbo_step(
                params, opt_state, prev, prior, x, y, w, k,
                cfg=cfg_in, tx=tx, beta=beta, n_train=n_train,
                chain_mask=chain_mask,
            )
            return (params, opt_state), (loss_val, aux)

        (params, opt_state), (losses, auxs) = jax.lax.scan(
            step, (params, opt_state), jnp.arange(n_epochs * steps_per_epoch)
        )
        if _exit_perm is not None:
            params = _map_u_tril_leaves(params, _exit_perm)
            opt_state = _map_u_tril_leaves(opt_state, _exit_perm)
        return params, opt_state, losses[-1], jax.tree_util.tree_map(
            lambda a: a[-1], auxs
        )

    return run


def pad_dataset_to_device(ds: ArrayDataset, batch_size: int, n_rows: int | None = None):
    """Pad to a batch multiple (or to ``n_rows``) with zero-weight rows and
    move to device."""
    n = len(ds)
    n_pad = ((n + batch_size - 1) // batch_size) * batch_size
    if n_rows is not None:
        assert n_rows >= n, (n_rows, n)
        n_pad = max(
            n_pad, ((n_rows + batch_size - 1) // batch_size) * batch_size
        )
    x = np.zeros((n_pad, ds.data.shape[1]), dtype=np.float32)
    y = np.zeros((n_pad,), dtype=np.int32)
    w = np.zeros((n_pad,), dtype=np.float32)
    x[:n], y[:n], w[:n] = ds.data, ds.targets, 1.0
    return jnp.asarray(x), jnp.asarray(y), jnp.asarray(w)


def make_device_eval_fn(
    cfg: V.VARGPConfig, hp: TrainHyperparams | None = None, mesh=None
):
    """Scanned whole-dataset accuracy: all eval batches in one dispatch.

    xs: (K, B, D), ys/ws: (K, B) — returns (correct_count, weight_count).

    By default theta (the kernel hyper-samples) is drawn ONCE and shared
    across all eval batches: the reference re-samples per batch
    (train_utils.py:24-28 calls predict per batch), but at eval the samples
    are a pure MC estimate — sharing them across the scan is the same
    estimator over a dataset-level budget and saves one Gram+Cholesky per
    batch.  Set hp.eval_resample_per_batch=True for reference semantics.
    """
    n_f = hp.eval_n_f if hp else None
    n_v = hp.eval_n_var_samples if hp else None
    resample = hp.eval_resample_per_batch if hp else False
    if mesh is not None:
        from vargp_tpu.parallel.mesh import batch_shardings

        batch_sh = batch_shardings(mesh)

    from vargp_tpu.likelihoods import softmax_predict

    @jax.jit
    def eval_acc(params, prev, chain_mask, xs, ys, ws, key):
        k_post, k_lik = jax.random.split(key)
        if not resample:
            # hoist the (sum M)^3 posterior build out of the batch scan
            cp = V.build_posterior(
                params, prev, k_post, cfg,
                chain_mask=chain_mask, n_var_samples=n_v,
            )

        def body(carry, batch):
            i, correct, ok = carry
            x, y, w = batch
            if mesh is not None:
                x, y, w = jax.lax.with_sharding_constraint((x, y, w), batch_sh)
            if resample:
                probs = V.predict(
                    params, prev, x, jax.random.fold_in(key, i), cfg,
                    n_f=n_f, n_var_samples=n_v, chain_mask=chain_mask,
                )
            else:
                f_mean, f_var = V.marginal_diag(
                    cp, params, x, cfg, chain_mask=chain_mask
                )
                probs = softmax_predict(
                    jax.random.fold_in(k_lik, i), f_mean, f_var, n_f or cfg.n_f
                )
            hits = (jnp.argmax(probs, axis=-1) == y).astype(jnp.float32) * w
            # argmax of all-NaN probs still yields a valid index, so a
            # correct-count alone can never expose a diverged posterior
            # (parity: train_utils.py:29 asserts on the probs themselves)
            ok = ok & jnp.all(jnp.isfinite(probs))
            return (i + 1, correct + jnp.sum(hits), ok), None

        (_, correct, ok), _ = jax.lax.scan(
            body, (0, 0.0, jnp.bool_(True)), (xs, ys, ws)
        )
        # poison the count so the caller's isfinite assert trips on NaN
        # predictions exactly like the non-scan path's compute_accuracy
        correct = jnp.where(ok, correct, jnp.nan)
        return correct, jnp.sum(ws)

    return eval_acc


def stack_eval_set(ds: ArrayDataset, batch_size: int, n_batches: int | None = None):
    """Stack a dataset into fixed-shape eval batches (K, B, ...) once;
    pads with zero-weight batches up to ``n_batches`` if given."""
    xs, ys, ws = [], [], []
    for b in batch_iter(ds, batch_size, shuffle=False):
        xs.append(b.x)
        ys.append(b.y)
        ws.append(b.w)
    if n_batches is not None:
        while len(xs) < n_batches:
            xs.append(np.zeros_like(xs[0]))
            ys.append(np.zeros_like(ys[0]))
            ws.append(np.zeros_like(ws[0]))
    return (
        jnp.asarray(np.stack(xs)),
        jnp.asarray(np.stack(ys)),
        jnp.asarray(np.stack(ws)),
    )


def make_predict_fn(cfg: V.VARGPConfig, hp: TrainHyperparams | None = None):
    n_f = hp.eval_n_f if hp else None
    n_v = hp.eval_n_var_samples if hp else None

    @jax.jit
    def predict(params, prev, x, key):
        return V.predict(params, prev, x, key, cfg, n_f=n_f, n_var_samples=n_v)

    return predict


def _eval_batches(hp: TrainHyperparams, ds: ArrayDataset) -> int | None:
    if hp.pad_eval_batches is None:
        return None
    need = -(-len(ds) // hp.batch_size)
    return max(hp.pad_eval_batches, need)


def train_task(
    key: jax.Array,
    task_id: int,
    train_set: ArrayDataset,
    val_set: ArrayDataset,
    test_set: ArrayDataset,
    cfg: V.VARGPConfig,
    hp: TrainHyperparams,
    prev_chain: Sequence[V.VARGPParams] = (),
    logger=None,
    seed: int | None = None,
    ls_init=None,
    shared: dict | None = None,
    mesh=None,
):
    """Train one task; returns (best_params, info dict).

    ``prev_chain`` holds the best params of every earlier task; the frozen
    TaskPosterior chain, kernel hyperprior chaining and DKL warm-start are
    derived from it (parity: create_clf, vargp.py:200-243).

    ``shared`` (with hp.pad_tasks_to/pad_data_rows/pad_eval_batches set)
    carries jitted programs across tasks: padded-chain compilation makes
    every task's programs shape-identical, so the whole continual run
    compiles once.

    ``mesh`` (a ("data","model") jax.sharding.Mesh, parallel.make_mesh)
    runs the SAME compiled programs GSPMD-sharded: params/moments and the
    frozen chain shard their class axis over "model", minibatches shard
    over "data", everything else replicates.  The update math is identical
    (same elbo_step, same keys/permutations) — only placement changes.
    """
    if hp.pad_tasks_to is not None and not hp.scan_epoch:
        # reject at entry, not at the first eval — the late check used to
        # fire only after a full eval_interval of (discarded) training
        raise NotImplementedError("padded-chain mode requires scan_epoch=True")
    if mesh is not None:
        from vargp_tpu import parallel as _par

        if not hp.scan_epoch:
            raise ValueError("mesh training requires hp.scan_epoch=True")

        def _shard(tree):
            return _par.shard_params(tree, mesh, cfg.out_size)

        def _repl(tree):
            return _par.replicate(tree, mesh)

    else:
        _shard = _repl = lambda tree: tree

    k_init, k_run = jax.random.split(key)

    prev = tuple(V.freeze_task(p) for p in prev_chain)
    if hp.pad_tasks_to is not None:
        prev, chain_mask = V.pad_chain(prev, cfg, hp.pad_tasks_to)
    else:
        chain_mask = jnp.ones((len(prev),), jnp.float32)
    prev = _shard(prev)
    chain_mask = _repl(chain_mask)
    shared = shared if shared is not None else {}
    kernel_prior_from = prev_chain[-1].kernel if prev_chain else None
    phi_init = prev_chain[-1].phi if (prev_chain and cfg.dkl) else None

    z_init = V.select_inducing(
        k_init, jnp.asarray(train_set.data), cfg.M, cfg.out_size
    )
    log_ls = None
    if ls_init == "median":
        log_ls = V.median_log_lengthscale(jnp.asarray(train_set.data))
    elif ls_init is not None:
        log_ls = float(np.log(ls_init))
    params, prior = V.init_params(
        k_init, z_init, cfg, kernel_prior_from=kernel_prior_from,
        phi_init=phi_init, log_lengthscale_init=log_ls,
    )
    params = _shard(params)
    prior = _repl(prior)

    tx = shared.setdefault("tx", make_optimizer(hp))
    opt_state = tx.init(params)
    if hp.freeze_phi_after_first and cfg.dkl and task_id > 0:
        opt_state = set_phi_update_scale(opt_state, 0.0)
    opt_state = _shard(opt_state)
    n_train = _repl(jnp.asarray(float(len(train_set))))
    if hp.scan_epoch:
        # dataset lives on device; shuffle/batch/update all inside one
        # compiled block of eval_interval epochs
        data_x, data_y, data_w = _repl(
            pad_dataset_to_device(
                train_set, hp.batch_size, n_rows=hp.pad_data_rows
            )
        )
        steps_per_epoch = data_x.shape[0] // hp.batch_size
        _block_fns = shared.setdefault("block_fns", {})

        def run_block(n_epochs, *args):
            if n_epochs not in _block_fns:
                # serialize compile vs in-flight dispatch: compiling a new
                # program while a device block executes intermittently
                # deadlocks the tunnel client (futex wait, zero CPU —
                # observed even with the persistent compile cache off, so
                # the overlap itself is the trigger, not the cache).
                # args[0] is the previous block's (possibly in-flight)
                # params output; syncing it costs nothing material.
                jax.block_until_ready(args[0])
                _block_fns[n_epochs] = make_device_train_fn(
                    cfg, tx, hp.beta, hp.batch_size, n_epochs, mesh=mesh
                )
            return _block_fns[n_epochs](*args)

    else:
        update = make_update_fn(cfg, tx, hp.beta, len(train_set))
    predict = make_predict_fn(cfg, hp)
    if hp.scan_epoch:
        if "eval_acc" not in shared:
            shared["eval_acc"] = make_device_eval_fn(cfg, hp, mesh=mesh)
        eval_acc = shared["eval_acc"]
        eval_stacks = {
            "train": (
                _repl(stack_eval_set(train_set, hp.batch_size, _eval_batches(hp, train_set))),
                len(train_set),
            ),
            "val": (
                _repl(stack_eval_set(val_set, hp.batch_size, _eval_batches(hp, val_set))),
                len(val_set),
            ),
            "test": (
                _repl(stack_eval_set(test_set, hp.batch_size, _eval_batches(hp, test_set))),
                len(test_set),
            ),
        }

        def _acc(split, k):
            (xs, ys, ws), n = eval_stacks[split]
            # sync the in-flight train block before the eval dispatch: the
            # eval program recompiles whenever a split's batch count grows
            # (task-growing eval stacks), and compile-while-dispatch
            # intermittently deadlocks the tunnel client (see run_block).
            # The eval consumes params anyway, so this loses only the
            # compile/execute overlap that triggers the hang.
            jax.block_until_ready(params)
            correct, _ = eval_acc(params, prev, chain_mask, xs, ys, ws, _repl(k))
            correct = float(correct)
            assert np.isfinite(correct), "Found NaNs"
            return correct / n

    stopper = EarlyStopper(patience=hp.patience)
    data_rng = np.random.default_rng(seed)
    key_seq = k_run

    aux = (jnp.zeros(()),) * 3
    t_start = time.time()
    steps = 0
    epoch = -1
    last_eval = 0  # epochs completed at the most recent eval
    max_block_epochs = max(1, hp.max_steps_per_dispatch // max(steps_per_epoch, 1)) if hp.scan_epoch else 1
    while epoch + 1 < hp.epochs:
        if hp.scan_epoch:
            # stop the block exactly on the eval cadence even when
            # max_steps_per_dispatch caps it below eval_interval
            to_eval = hp.eval_interval - ((epoch + 1) - last_eval)
            block = min(max(to_eval, 1), hp.epochs - (epoch + 1), max_block_epochs)
            key_seq, k_blk = jax.random.split(key_seq)
            params, opt_state, loss_val, aux = run_block(
                block, params, opt_state, prev, prior, chain_mask, n_train,
                data_x, data_y, data_w, _repl(k_blk),
            )
            steps += block * steps_per_epoch
            epoch += block
        else:
            epoch += 1
            for b in batch_iter(train_set, hp.batch_size, rng=data_rng):
                key_seq, k_step = jax.random.split(key_seq)
                params, opt_state, loss_val, aux = update(
                    params, opt_state, prev, prior,
                    jnp.asarray(b.x), jnp.asarray(b.y), jnp.asarray(b.w), k_step,
                    chain_mask,
                )
                steps += 1

        if (epoch + 1) - last_eval >= hp.eval_interval or epoch + 1 >= hp.epochs:
            last_eval = epoch + 1
            key_seq, k_ev = jax.random.split(key_seq)

            if hp.scan_epoch:
                train_acc = _acc("train", k_ev)
                val_acc = _acc("val", k_ev)
                test_acc = _acc("test", k_ev)
            else:

                def pf(x, _k=k_ev):
                    return predict(params, prev, jnp.asarray(x), _k)

                train_acc = compute_accuracy(train_set, pf, hp.batch_size)
                val_acc = compute_accuracy(val_set, pf, hp.batch_size)
                test_acc = compute_accuracy(test_set, pf, hp.batch_size)

            klh, klu, nll = (float(a) for a in aux)
            if not all(np.isfinite(v) for v in (klh, klu, nll)):
                raise FloatingPointError(
                    f"non-finite ELBO at epoch {epoch + 1}: "
                    f"kl_hypers={klh} kl_u={klu} nll={nll}"
                )
            scalars = {
                f"task{task_id}/loss/kl_hypers": klh,
                f"task{task_id}/loss/kl_u": klu,
                f"task{task_id}/loss/lik": nll,
                f"task{task_id}/train/acc": train_acc,
                f"task{task_id}/val/acc": val_acc,
                f"task{task_id}/test/acc": test_acc,
            }
            if logger is not None:
                for k, v in scalars.items():
                    logger.add_scalar(k, v, step=epoch + 1)

            # snapshot: update() donates its params input buffers, so the
            # stored best params must be an independent copy — taken
            # LAZILY (the stopper calls the thunk only on improvement, so
            # plateaued evals skip the full-pytree device copy)
            stopper(
                val_acc,
                lambda _p=params, _e=epoch, _t=train_acc, _v=val_acc, _s=test_acc: dict(
                    params=jax.tree_util.tree_map(jnp.copy, _p),
                    acc_summary={
                        f"task{task_id}/train/acc": _t,
                        f"task{task_id}/val/acc": _v,
                        f"task{task_id}/test/acc": _s,
                    },
                    step=_e + 1,
                ),
            )
            if stopper.is_done():
                break

    info = stopper.info() or dict(params=params, acc_summary={}, step=hp.epochs)
    info["steps_per_sec"] = steps / max(time.time() - t_start, 1e-9)
    if logger is not None:
        for k, v in info.get("acc_summary", {}).items():
            logger.add_scalar(f"{k}_best", v, step=info.get("step", 0))
    return info["params"], info
