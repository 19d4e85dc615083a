"""Global continual SVGP drivers (parity: experiments/mnist_global.py,
experiments/toy_global.py — re-designed working versions)."""

import os

import jax
import numpy as np

from vargp_tpu import data
from vargp_tpu.models.global_svgp import GlobalSVGPConfig
from vargp_tpu.train.loop import TrainHyperparams
from vargp_tpu.train.loop_global import train_task
from vargp_tpu.utils import MetricsLogger, save_chain, seed_everything


def _log_dir(name: str) -> str:
    base = os.environ.get("VARGP_TPU_LOGDIR", "runs")
    return os.path.join(base, name)


def _run(name, tasks, make_cfg, hp, seed, log_dir=None):
    key, seed = seed_everything(seed)
    log_dir = log_dir or _log_dir(name)
    prev_params = None
    summaries = []
    with MetricsLogger(log_dir) as logger:
        for t, (train_set, val_set, test_set, cfg) in enumerate(tasks):
            key, k_task = jax.random.split(key)
            params, info = train_task(
                k_task, t, train_set, val_set, test_set, cfg, hp,
                prev_state=prev_params, logger=logger, seed=seed + t,
            )
            # parity: toy_global keeps only last state (toy_global.py:38);
            # mnist_global chains the last task's params likewise
            prev_params = params
            save_chain(log_dir, t, params)
            summaries.append(info.get("acc_summary", {}))
            print(
                f"[{name}] task {t}: "
                + " ".join(f"{k.split('/')[-2]}={v:.4f}" for k, v in info.get("acc_summary", {}).items())
            )
    return prev_params, summaries


def toy_global(
    epochs=10000, M=20, lr=1e-2, batch_size=512, beta=1.0,
    n_f=10, n_var_samples=3, map_est_hypers=False, seed=None,
    eval_interval=10, log_dir=None,
):
    """Parity: experiments/toy_global.py — M grows as M*(t+1)."""
    toy_all = data.make_toy_dataset(seed=seed or 0)

    def tasks():
        for t in range(2):
            train_set = data.filter_by_class(toy_all, [2 * t, 2 * t + 1])
            seen = data.filter_by_class(toy_all, range(2 * t + 2))
            cfg = GlobalSVGPConfig(
                M=M * (t + 1), out_size=4, in_size=2, n_f=n_f,
                n_var_samples=n_var_samples, map_est_hypers=bool(map_est_hypers),
            )
            yield train_set, seen, seen, cfg

    hp = TrainHyperparams(
        epochs=epochs, lr=lr, batch_size=batch_size, beta=beta,
        eval_interval=eval_interval, patience=-1,
    )
    return _run("toy_global", tasks(), None, hp, seed, log_dir)


def split_mnist(
    data_dir=None, epochs=500, M=60, lr=3e-3, batch_size=512, beta=10.0,
    n_f=10, n_var_samples=3, map_est_hypers=False, seed=None,
    eval_interval=10, patience=20, log_dir=None, n_tasks=5, grow_per_task=0,
):
    """Parity: experiments/mnist_global.py:13-46.  ``grow_per_task`` adds
    inducing rows per task (the reference silently assumes growth via the
    M argument; explicit here)."""
    rng = np.random.default_rng(seed or 0)
    train_full = data.load_mnist(data_dir, train=True)
    test_full = data.load_mnist(data_dir, train=False)
    train_all, val_all = data.split_train_val(train_full, 10000, rng)

    def tasks():
        for t in range(n_tasks):
            train_set = data.filter_by_class(train_all, [2 * t, 2 * t + 1])
            val_set = data.filter_by_class(val_all, range(2 * t + 2))
            test_set = data.filter_by_class(test_full, range(2 * t + 2))
            cfg = GlobalSVGPConfig(
                M=M + grow_per_task * t, out_size=10, in_size=784, n_f=n_f,
                n_var_samples=n_var_samples, map_est_hypers=bool(map_est_hypers),
            )
            yield train_set, val_set, test_set, cfg

    hp = TrainHyperparams(
        epochs=epochs, lr=lr, batch_size=batch_size, beta=beta,
        eval_interval=eval_interval, patience=patience,
    )
    return _run("s_mnist_global", tasks(), None, hp, seed, log_dir)


def permuted_mnist(
    data_dir=None, n_tasks=10, epochs=1000, M=100, lr=3.7e-3,
    batch_size=512, beta=1.64, n_f=10, n_var_samples=3, seed=None,
    eval_interval=10, patience=20, log_dir=None, grow_per_task=0,
):
    """Parity: experiments/mnist_global.py:49-91."""
    rng = np.random.default_rng(seed or 0)
    train_full = data.load_mnist(data_dir, train=True)
    test_full = data.load_mnist(data_dir, train=False)
    train_all, val_all = data.split_train_val(train_full, 10000, rng)
    perms = data.make_permutations(n_tasks, 784, rng)

    from vargp_tpu.data.tasks import concat

    def tasks():
        val_seen, test_seen = [], []
        for t in range(n_tasks):
            train_set = data.apply_permutation(train_all, perms[t])
            val_seen.append(data.apply_permutation(val_all, perms[t]))
            test_seen.append(data.apply_permutation(test_full, perms[t]))
            cfg = GlobalSVGPConfig(
                M=M + grow_per_task * t, out_size=10, in_size=784, n_f=n_f,
                n_var_samples=n_var_samples,
            )
            yield train_set, concat(val_seen), concat(test_seen), cfg

    hp = TrainHyperparams(
        epochs=epochs, lr=lr, batch_size=batch_size, beta=beta,
        eval_interval=eval_interval, patience=patience,
    )
    return _run("p_mnist_global", tasks(), None, hp, seed, log_dir)
