"""VARGP-Retrain driver (parity: experiments/vargp_retrain.py — toy only
in the reference; T>2 is handled here, resolving the reference's TODO at
vargp_retrain.py:251)."""

import os
from functools import partial

import jax
import jax.numpy as jnp
import optax

from vargp_tpu import data
from vargp_tpu.models import vargp_retrain as R
from vargp_tpu.models.vargp import select_inducing
from vargp_tpu.train.loop import (
    TrainHyperparams,
    make_optimizer,
    pad_dataset_to_device,
)
from vargp_tpu.train.metrics import compute_accuracy
from vargp_tpu.utils import MetricsLogger, save_chain, seed_everything


def toy(
    epochs=5000, M=20, lr=1e-2, batch_size=512, beta=1.0,
    n_f=10, n_var_samples=3, seed=None, eval_interval=10, log_dir=None,
    n_tasks=2,
):
    # dataset seed resolves like vargp_run.toy / toy_global (`seed or 0`)
    # BEFORE randomization, so the retrain ablation trains on the SAME
    # 4-cluster dataset the VAR-GP run it is compared against used (and
    # that analyze_toy's density_retention scores, data_seed=0)
    data_seed = seed or 0
    key, seed = seed_everything(seed)
    log_dir = log_dir or os.path.join(
        os.environ.get("VARGP_TPU_LOGDIR", "runs"), "toy_retrain"
    )
    toy_all = data.make_toy_dataset(seed=data_seed)
    cfg = R.RetrainConfig(
        M=M, out_size=4, in_size=2, n_f=n_f, n_var_samples=n_var_samples
    )
    hp = TrainHyperparams(
        epochs=epochs, lr=lr, batch_size=batch_size, beta=beta,
        eval_interval=eval_interval, patience=-1,
    )

    prev_raw = ()
    kernel_prior_from = None
    summaries = []
    with MetricsLogger(log_dir) as logger:
        for t in range(n_tasks):
            train_set = data.filter_by_class(toy_all, [2 * t, 2 * t + 1])
            seen = data.filter_by_class(toy_all, range(2 * t + 2))

            # independent streams per consumer — reusing one key for the
            # inducing selection, the init, and the training blocks would
            # deterministically couple their randomness
            key, k_sel, k_init, k_task = jax.random.split(key, 4)
            z_init = select_inducing(
                k_sel, jnp.asarray(train_set.data), cfg.M, cfg.out_size
            )
            params, prior, frozen = R.init_params(
                k_init, z_init, cfg, prev_chain=prev_raw,
                kernel_prior_from=kernel_prior_from,
            )

            tx = make_optimizer(hp)
            opt_state = tx.init(params)
            n_train = len(train_set)

            def step_fn(p, o, x, y, w, k):
                def total(p):
                    klh, klu, nll = R.loss(p, frozen, prior, x, y, k, cfg, weights=w)
                    scale = n_train / jnp.maximum(jnp.sum(w), 1.0)
                    return hp.beta * klh + klu + scale * nll, (klh, klu, nll)

                (lv, aux), g = jax.value_and_grad(total, has_aux=True)(p)
                up, o = tx.update(g, o, p)
                return optax.apply_updates(p, up), o, lv, aux

            # scanned device block (same treatment as train.loop): dataset
            # in HBM, shuffle/batch/update compiled into one dispatch per
            # eval interval
            data_x, data_y, data_w = pad_dataset_to_device(
                train_set, hp.batch_size
            )
            n_pad = data_x.shape[0]
            steps_per_epoch = n_pad // hp.batch_size

            @partial(jax.jit, static_argnums=(0,), donate_argnums=(1, 2))
            def run_block(n_epochs, p, o, key):
                perms = jax.vmap(
                    lambda e: jax.random.permutation(
                        jax.random.fold_in(key, e), n_pad
                    )
                )(jnp.arange(n_epochs))

                def step(carry, s):
                    p, o = carry
                    e = s // steps_per_epoch
                    off = (s % steps_per_epoch) * hp.batch_size
                    idx = jax.lax.dynamic_slice(
                        perms[e], (off,), (hp.batch_size,)
                    )
                    k = jax.random.fold_in(key, n_epochs + s)
                    p, o, lv, aux = step_fn(
                        p, o, data_x[idx], data_y[idx], data_w[idx], k
                    )
                    return (p, o), (lv, aux)

                (p, o), (lvs, auxs) = jax.lax.scan(
                    step, (p, o), jnp.arange(n_epochs * steps_per_epoch)
                )
                return p, o, lvs[-1], jax.tree_util.tree_map(
                    lambda a: a[-1], auxs
                )

            @jax.jit
            def predict(p, x, k):
                return R.predict(p, x, k, cfg)

            key_seq = k_task
            max_block = max(
                1, hp.max_steps_per_dispatch // max(steps_per_epoch, 1)
            )
            epoch = 0
            while epoch < hp.epochs:
                to_eval = hp.eval_interval - (epoch % hp.eval_interval)
                block = min(to_eval, hp.epochs - epoch, max_block)
                key_seq, k_blk = jax.random.split(key_seq)
                params, opt_state, _, aux = run_block(
                    block, params, opt_state, k_blk
                )
                epoch += block
                if epoch % hp.eval_interval == 0:
                    key_seq, k_ev = jax.random.split(key_seq)
                    acc = compute_accuracy(
                        seen, lambda x: predict(params, jnp.asarray(x), k_ev),
                        hp.batch_size,
                    )
                    logger.add_scalar(f"task{t}/test/acc", acc, step=epoch)

            prev_raw = params.tasks
            kernel_prior_from = params.kernel
            save_chain(log_dir, t, params)
            acc = compute_accuracy(
                seen, lambda x: predict(params, jnp.asarray(x), key_seq),
                hp.batch_size,
            )
            summaries.append({f"task{t}/test/acc": acc})
            print(f"[toy_retrain] task {t}: test acc {acc:.4f}")
    return params, summaries
