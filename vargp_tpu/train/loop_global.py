"""Task-level training loop for the global continual SVGP.

Parity: var_gp/train_utils_global.py:54-114 (re-designed working version —
the reference module is import-broken).  Loss assembly:
beta*kl_hypers + kl_u - u_prev_reg + (N/B)*nll.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vargp_tpu.data.core import ArrayDataset, batch_iter
from vargp_tpu.models import global_svgp as G
from vargp_tpu.train.loop import TrainHyperparams, make_optimizer
from vargp_tpu.train.metrics import compute_accuracy
from vargp_tpu.train.stopper import EarlyStopper


def _global_step(params, opt_state, prev, prior, x, y, w, key, *,
                 cfg, tx, beta, n_train):
    """One ELBO update of the global model (shared by both train paths)."""

    def total_loss(p):
        klh, klu, upr, nll = G.loss(p, prev, prior, x, y, key, cfg, weights=w)
        scale = n_train / jnp.maximum(jnp.sum(w), 1.0)
        return beta * klh + klu - upr + scale * nll, (klh, klu, upr, nll)

    (loss_val, aux), grads = jax.value_and_grad(total_loss, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss_val, aux


def make_update_fn(cfg: G.GlobalSVGPConfig, tx, beta: float, n_train: int):
    @partial(jax.jit, donate_argnums=(0, 1))
    def update(params, opt_state, prev, prior, x, y, w, key):
        return _global_step(
            params, opt_state, prev, prior, x, y, w, key,
            cfg=cfg, tx=tx, beta=beta, n_train=n_train,
        )

    return update


def make_device_train_fn_global(
    cfg: G.GlobalSVGPConfig, tx, beta: float, batch_size: int, n_epochs: int
):
    """Fully on-device training block for the global model: the task
    dataset lives in HBM, shuffling/batching/updates run inside ONE
    compiled flat scan — the same treatment train.loop.make_device_train_fn
    gives the VARGP chain (one dispatch per eval interval instead of one
    per minibatch).  Unlike the chain model there is no padded-task trick:
    the global model GROWS its inducing block per task
    (global_svgp.grow_inducing), so each task compiles its own block."""

    @partial(jax.jit, donate_argnums=(0, 1))
    def run(params, opt_state, prev, prior, n_train,
            data_x, data_y, data_w, key):
        n_pad = data_x.shape[0]
        steps_per_epoch = n_pad // batch_size
        perm_keys = jax.vmap(lambda e: jax.random.fold_in(key, e))(
            jnp.arange(n_epochs)
        )
        perms = jax.vmap(lambda k: jax.random.permutation(k, n_pad))(perm_keys)

        def step(carry, s):
            params, opt_state = carry
            e = s // steps_per_epoch
            o = (s % steps_per_epoch) * batch_size
            idx = jax.lax.dynamic_slice(perms[e], (o,), (batch_size,))
            k = jax.random.fold_in(key, n_epochs + s)
            params, opt_state, loss_val, aux = _global_step(
                params, opt_state, prev, prior,
                data_x[idx], data_y[idx], data_w[idx], k,
                cfg=cfg, tx=tx, beta=beta, n_train=n_train,
            )
            return (params, opt_state), (loss_val, aux)

        (params, opt_state), (losses, auxs) = jax.lax.scan(
            step, (params, opt_state), jnp.arange(n_epochs * steps_per_epoch)
        )
        return params, opt_state, losses[-1], jax.tree_util.tree_map(
            lambda a: a[-1], auxs
        )

    return run


def make_device_eval_fn_global(
    cfg: G.GlobalSVGPConfig, hp: TrainHyperparams | None = None
):
    """Scanned whole-dataset accuracy for the global model: all eval
    batches in one dispatch (xs: (K, B, D), ys/ws: (K, B)).  Honors
    hp.eval_n_f / hp.eval_n_var_samples like the VARGP eval loop."""
    n_f = hp.eval_n_f if hp else None
    n_v = hp.eval_n_var_samples if hp else None

    @jax.jit
    def eval_acc(params, prev, xs, ys, ws, key):
        def body(carry, batch):
            i, correct, ok = carry
            x, y, w = batch
            probs = G.predict(
                params, prev, x, jax.random.fold_in(key, i), cfg,
                n_f=n_f, n_var_samples=n_v,
            )
            hits = (jnp.argmax(probs, axis=-1) == y).astype(jnp.float32) * w
            # see train.loop.make_device_eval_fn: argmax of NaN probs is a
            # valid index, so track finiteness explicitly
            ok = ok & jnp.all(jnp.isfinite(probs))
            return (i + 1, correct + jnp.sum(hits), ok), None

        (_, correct, ok), _ = jax.lax.scan(
            body, (0, 0.0, jnp.bool_(True)), (xs, ys, ws)
        )
        return jnp.where(ok, correct, jnp.nan), jnp.sum(ws)

    return eval_acc


def train_task(
    key: jax.Array,
    task_id: int,
    train_set: ArrayDataset,
    val_set: ArrayDataset,
    test_set: ArrayDataset,
    cfg: G.GlobalSVGPConfig,
    hp: TrainHyperparams,
    prev_state: tuple | None = None,  # (GlobalSVGPParams of prev task)
    logger=None,
    seed: int | None = None,
):
    """Train one task of the global model; returns (best_params, info)."""
    k_init, k_run = jax.random.split(key)

    data_arr = jnp.asarray(train_set.data)
    if prev_state is not None:
        prev_params = prev_state
        prev = G.freeze_task(prev_params)
        z_init = G.grow_inducing(k_init, prev_params.z, data_arr, cfg.M, cfg.out_size)
        kernel_prior_from = prev_params.kernel
    else:
        prev = None
        z_init = G.select_inducing(k_init, data_arr, cfg.M, cfg.out_size)
        kernel_prior_from = None

    params, prior = G.init_params(
        k_init, z_init, cfg, kernel_prior_from=kernel_prior_from
    )

    tx = make_optimizer(hp)
    opt_state = tx.init(params)
    n_train_arr = jnp.asarray(float(len(train_set)))

    if hp.scan_epoch:
        from vargp_tpu.train.loop import (
            _eval_batches,
            pad_dataset_to_device,
            stack_eval_set,
        )

        data_x, data_y, data_w = pad_dataset_to_device(train_set, hp.batch_size)
        steps_per_epoch = data_x.shape[0] // hp.batch_size
        _block_fns = {}

        def run_block(n_epochs, *args):
            if n_epochs not in _block_fns:
                _block_fns[n_epochs] = make_device_train_fn_global(
                    cfg, tx, hp.beta, hp.batch_size, n_epochs
                )
            return _block_fns[n_epochs](*args)

        eval_acc = make_device_eval_fn_global(cfg, hp)
        eval_stacks = {
            "train": (
                stack_eval_set(train_set, hp.batch_size, _eval_batches(hp, train_set)),
                len(train_set),
            ),
            "val": (
                stack_eval_set(val_set, hp.batch_size, _eval_batches(hp, val_set)),
                len(val_set),
            ),
            "test": (
                stack_eval_set(test_set, hp.batch_size, _eval_batches(hp, test_set)),
                len(test_set),
            ),
        }

        def _acc(split, k):
            (xs, ys, ws), n = eval_stacks[split]
            correct, _ = eval_acc(params, prev, xs, ys, ws, k)
            correct = float(correct)
            assert np.isfinite(correct), "Found NaNs"
            return correct / n

    else:
        update = make_update_fn(cfg, tx, hp.beta, len(train_set))

        @jax.jit
        def predict(p, x, k):
            return G.predict(
                p, prev, x, k, cfg,
                n_f=hp.eval_n_f, n_var_samples=hp.eval_n_var_samples,
            )

    stopper = EarlyStopper(patience=hp.patience)
    data_rng = np.random.default_rng(seed)
    key_seq = k_run
    t0 = time.time()
    steps = 0
    aux = (jnp.zeros(()),) * 4
    epoch = -1
    last_eval = 0
    max_block_epochs = (
        max(1, hp.max_steps_per_dispatch // max(steps_per_epoch, 1))
        if hp.scan_epoch
        else 1
    )

    while epoch + 1 < hp.epochs:
        if hp.scan_epoch:
            to_eval = hp.eval_interval - ((epoch + 1) - last_eval)
            block = min(max(to_eval, 1), hp.epochs - (epoch + 1), max_block_epochs)
            key_seq, k_blk = jax.random.split(key_seq)
            params, opt_state, _, aux = run_block(
                block, params, opt_state, prev, prior, n_train_arr,
                data_x, data_y, data_w, k_blk,
            )
            steps += block * steps_per_epoch
            epoch += block
        else:
            epoch += 1
            for b in batch_iter(train_set, hp.batch_size, rng=data_rng):
                key_seq, k_step = jax.random.split(key_seq)
                params, opt_state, _, aux = update(
                    params, opt_state, prev, prior,
                    jnp.asarray(b.x), jnp.asarray(b.y), jnp.asarray(b.w), k_step,
                )
                steps += 1

        if (epoch + 1) - last_eval >= hp.eval_interval or epoch + 1 >= hp.epochs:
            last_eval = epoch + 1
            key_seq, k_ev = jax.random.split(key_seq)
            if hp.scan_epoch:
                accs = {
                    f"task{task_id}/train/acc": _acc("train", k_ev),
                    f"task{task_id}/val/acc": _acc("val", k_ev),
                    f"task{task_id}/test/acc": _acc("test", k_ev),
                }
            else:
                pf = lambda x: predict(params, jnp.asarray(x), k_ev)
                accs = {
                    f"task{task_id}/train/acc": compute_accuracy(train_set, pf, hp.batch_size),
                    f"task{task_id}/val/acc": compute_accuracy(val_set, pf, hp.batch_size),
                    f"task{task_id}/test/acc": compute_accuracy(test_set, pf, hp.batch_size),
                }
            klh, klu, upr, nll = (float(a) for a in aux)
            if not all(np.isfinite(v) for v in (klh, klu, upr, nll)):
                raise FloatingPointError(
                    f"non-finite ELBO at epoch {epoch + 1}: "
                    f"kl_hypers={klh} kl_u={klu} u_prev_reg={upr} nll={nll}"
                )
            if logger is not None:
                for k, v in {
                    f"task{task_id}/loss/kl_hypers": klh,
                    f"task{task_id}/loss/kl_u": klu,
                    f"task{task_id}/loss/u_prev_reg": upr,
                    f"task{task_id}/loss/lik": nll,
                    **accs,
                }.items():
                    logger.add_scalar(k, v, step=epoch + 1)
            # lazy snapshot: copied only when the stopper records a new best
            stopper(
                accs[f"task{task_id}/val/acc"],
                lambda _p=params, _a=accs, _e=epoch: dict(
                    params=jax.tree_util.tree_map(jnp.copy, _p),
                    acc_summary=_a, step=_e + 1,
                ),
            )
            if stopper.is_done():
                break

    info = stopper.info() or dict(params=params, acc_summary={}, step=hp.epochs)
    info["steps_per_sec"] = steps / max(time.time() - t0, 1e-9)
    return info["params"], info
