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


def make_update_fn(cfg: G.GlobalSVGPConfig, tx, beta: float, n_train: int):
    @partial(jax.jit, donate_argnums=(0, 1))
    def update(params, opt_state, prev, prior, x, y, w, key):
        def total_loss(p):
            klh, klu, upr, nll = G.loss(p, prev, prior, x, y, key, cfg, weights=w)
            scale = n_train / jnp.maximum(jnp.sum(w), 1.0)
            return beta * klh + klu - upr + scale * nll, (klh, klu, upr, nll)

        (loss_val, aux), grads = jax.value_and_grad(total_loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_val, aux

    return update


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
    update = make_update_fn(cfg, tx, hp.beta, len(train_set))

    @jax.jit
    def predict(p, x, k):
        return G.predict(p, prev, x, k, cfg)

    stopper = EarlyStopper(patience=hp.patience)
    data_rng = np.random.default_rng(seed)
    key_seq = k_run
    t0 = time.time()
    steps = 0
    aux = (jnp.zeros(()),) * 4

    for epoch in range(hp.epochs):
        for b in batch_iter(train_set, hp.batch_size, rng=data_rng):
            key_seq, k_step = jax.random.split(key_seq)
            params, opt_state, _, aux = update(
                params, opt_state, prev, prior,
                jnp.asarray(b.x), jnp.asarray(b.y), jnp.asarray(b.w), k_step,
            )
            steps += 1

        if (epoch + 1) % hp.eval_interval == 0:
            key_seq, k_ev = jax.random.split(key_seq)
            pf = lambda x: predict(params, jnp.asarray(x), k_ev)
            accs = {
                f"task{task_id}/train/acc": compute_accuracy(train_set, pf, hp.batch_size),
                f"task{task_id}/val/acc": compute_accuracy(val_set, pf, hp.batch_size),
                f"task{task_id}/test/acc": compute_accuracy(test_set, pf, hp.batch_size),
            }
            klh, klu, upr, nll = (float(a) for a in aux)
            if logger is not None:
                for k, v in {
                    f"task{task_id}/loss/kl_hypers": klh,
                    f"task{task_id}/loss/kl_u": klu,
                    f"task{task_id}/loss/u_prev_reg": upr,
                    f"task{task_id}/loss/lik": nll,
                    **accs,
                }.items():
                    logger.add_scalar(k, v, step=epoch + 1)
            snapshot = jax.tree_util.tree_map(jnp.copy, params)
            stopper(
                accs[f"task{task_id}/val/acc"],
                dict(params=snapshot, acc_summary=accs, step=epoch + 1),
            )
            if stopper.is_done():
                break

    info = stopper.info() or dict(params=params, acc_summary={}, step=hp.epochs)
    info["steps_per_sec"] = steps / max(time.time() - t0, 1e-9)
    return info["params"], info
