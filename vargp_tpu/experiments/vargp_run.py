"""VARGP experiment drivers (parity: experiments/vargp.py).

Entry points: toy, split_mnist (s_mnist), permuted_mnist (p_mnist) with the
reference's default hyperparameters and task protocols:
  - toy: 2 tasks x 2 classes, epochs=5000, M=20, lr=1e-2, beta=1.0
  - s_mnist: 5 tasks, classes {2t, 2t+1}, val/test on classes seen so far,
    epochs=500, M=60, lr=3e-3, beta=10.0, patience=20
  - p_mnist: 10 tasks of pixel permutations (task 0 unpermuted),
    epochs=1000, M=100, lr=3.7e-3, beta=1.64
"""

import os

import jax
import numpy as np

from vargp_tpu import data
from vargp_tpu.models.vargp import VARGPConfig
from vargp_tpu.train.loop import TrainHyperparams, train_task
from vargp_tpu.utils import MetricsLogger, save_chain, seed_everything


def _log_dir(name: str) -> str:
    base = os.environ.get("VARGP_TPU_LOGDIR", "runs")
    return os.path.join(base, name)


def _make_mesh_arg(n_devices, model_parallel):
    """CLI --n_devices/--model_parallel -> jax.sharding.Mesh (or None).

    The TPU-native scale-out the reference never had (SURVEY §2.3): the
    same continual experiment runs GSPMD-sharded over a ("data","model")
    mesh — batch over "data", the per-class GP state over "model"."""
    if not n_devices:
        return None
    from vargp_tpu import parallel

    return parallel.make_mesh(int(n_devices), model_parallel)


def _run_task_stream(
    name, tasks, cfg, hp, seed, log_dir=None, n_tasks_cap=None, ls_init=None,
    resume=False, meta=None, mesh=None,
):
    """Shared continual loop: per-task train, chain growth, ckpt save.

    ``resume=True`` reloads completed tasks' ckpt{t}.npz from log_dir and
    continues from the first missing task (failure recovery — the
    checkpoint chain IS the model, so resumption is exact).

    ``mesh``: run every task's training/eval GSPMD-sharded (see
    train_task).  Checkpoint/metrics writes are gated to process 0 so the
    same driver works under multi-process jax.distributed."""
    key, seed = seed_everything(seed)
    log_dir = log_dir or _log_dir(name)
    chain = []
    summaries = []
    shared = {}
    is_lead = jax.process_index() == 0
    if meta and mesh is not None:
        meta = dict(
            meta,
            mesh=f"{mesh.devices.shape[0]} data x {mesh.devices.shape[1]} model",
        )
    if meta and is_lead:
        import json

        os.makedirs(log_dir, exist_ok=True)
        with open(os.path.join(log_dir, "run_meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
        print(f"[{name}] " + " ".join(f"{k}={v}" for k, v in meta.items()))
    with MetricsLogger(log_dir if is_lead else None) as logger:
        for t, (train_set, val_set, test_set) in enumerate(tasks):
            if n_tasks_cap is not None and t >= n_tasks_cap:
                break
            key, k_task = jax.random.split(key)
            ckpt_path = os.path.join(log_dir, f"ckpt{t}.npz")
            if resume and os.path.exists(ckpt_path):
                from vargp_tpu.models.vargp import init_params
                from vargp_tpu.utils.checkpoint import load_pytree

                # shape template only — load_pytree overwrites every leaf,
                # so skip the full-train-set inducing selection a real init
                # would pay (analysis.load_task_chain uses the same trick)
                z0 = jax.numpy.zeros((cfg.out_size, cfg.M, cfg.in_size))
                template, _ = init_params(k_task, z0, cfg)
                chain.append(load_pytree(ckpt_path, template))
                summaries.append({})
                print(f"[{name}] task {t}: resumed from {ckpt_path}")
                continue
            params, info = train_task(
                k_task, t, train_set, val_set, test_set, cfg, hp,
                prev_chain=chain, logger=logger, seed=seed + t,
                ls_init=ls_init, shared=shared, mesh=mesh,
            )
            chain.append(params)
            # COLLECTIVE (all processes): under multi-process
            # jax.distributed a model-sharded leaf's shards live on other
            # hosts, so the lead's np conversion would raise — all-gather
            # to host first, then the write itself is lead-gated
            if mesh is not None:
                from vargp_tpu import parallel

                to_save = parallel.unshard_to_host(params, mesh)
            else:
                to_save = params
            if is_lead:
                save_chain(log_dir, t, to_save)
            summaries.append(info.get("acc_summary", {}))
            print(
                f"[{name}] task {t}: "
                + " ".join(f"{k.split('/')[-2]}={v:.4f}" for k, v in info.get("acc_summary", {}).items())
                + f" ({info.get('steps_per_sec', 0):.1f} steps/s)"
            )
    return chain, summaries


def toy(
    epochs=5000, M=20, lr=1e-2, batch_size=512, beta=1.0,
    n_f=10, n_var_samples=3, ep_var_mean=True, map_est_hypers=False,
    dkl=False, seed=None, eval_interval=10, log_dir=None, n_tasks=2,
    ls_init=None, resume=False, n_devices=None, model_parallel=None,
):
    """Parity: experiments/vargp.py:76-104 (patience disabled)."""
    toy_all = data.make_toy_dataset(seed=seed or 0)

    def tasks():
        for t in range(n_tasks):
            train_set = data.filter_by_class(toy_all, [2 * t, 2 * t + 1])
            seen = data.filter_by_class(toy_all, range(2 * t + 2))
            yield train_set, seen, seen

    cfg = VARGPConfig(
        M=M, out_size=4, in_size=2, n_f=n_f, n_var_samples=n_var_samples,
        ep_var_mean=bool(ep_var_mean), map_est_hypers=bool(map_est_hypers),
        dkl=bool(dkl),
    )
    # every task trains on len/n_classes*2 rows; pad to the larger of that
    # and one batch so small --batch_size values still fit the dataset
    task_rows = 2 * (len(toy_all) // 4)
    hp = TrainHyperparams(
        epochs=epochs, lr=lr, batch_size=batch_size, beta=beta,
        eval_interval=eval_interval, patience=-1,
        pad_tasks_to=n_tasks, pad_data_rows=max(batch_size, task_rows),
        pad_eval_batches=-(-len(toy_all) // batch_size),
    )
    return _run_task_stream(
        "toy", tasks(), cfg, hp, seed, log_dir, ls_init=ls_init, resume=resume,
        mesh=_make_mesh_arg(n_devices, model_parallel),
    )


def split_mnist(
    data_dir=None, epochs=500, M=60, lr=3e-3, batch_size=512, beta=10.0,
    n_f=10, n_var_samples=3, ep_var_mean=True, map_est_hypers=False,
    dkl=False, seed=None, eval_interval=10, patience=20, log_dir=None,
    n_tasks=5, ls_init=None, resume=False, n_devices=None,
    model_parallel=None,
):
    """Parity: experiments/vargp.py:107-140."""
    rng = np.random.default_rng(seed or 0)
    mnist_train_full = data.load_mnist(data_dir, train=True)
    mnist_test = data.load_mnist(data_dir, train=False)
    train_all, val_all = data.split_train_val(mnist_train_full, 10000, rng)

    def tasks():
        for t in range(n_tasks):
            train_set = data.filter_by_class(train_all, [2 * t, 2 * t + 1])
            val_set = data.filter_by_class(val_all, range(2 * t + 2))
            test_set = data.filter_by_class(mnist_test, range(2 * t + 2))
            yield train_set, val_set, test_set

    cfg = VARGPConfig(
        M=M, out_size=10, in_size=784, n_f=n_f, n_var_samples=n_var_samples,
        ep_var_mean=bool(ep_var_mean), map_est_hypers=bool(map_est_hypers),
        dkl=bool(dkl),
    )
    # padded-chain compilation: shape-constant programs across all tasks
    counts = np.bincount(train_all.targets, minlength=2 * n_tasks)
    max_train = int(max(counts[2 * t] + counts[2 * t + 1] for t in range(n_tasks)))
    max_eval_rows = max(
        max_train,
        int(np.sum(np.bincount(val_all.targets, minlength=2 * n_tasks)[: 2 * n_tasks])),
        int(np.sum(np.bincount(mnist_test.targets, minlength=2 * n_tasks)[: 2 * n_tasks])),
    )
    hp = TrainHyperparams(
        epochs=epochs, lr=lr, batch_size=batch_size, beta=beta,
        eval_interval=eval_interval, patience=patience,
        pad_tasks_to=n_tasks, pad_data_rows=max_train,
        pad_eval_batches=-(-max_eval_rows // batch_size),
    )
    return _run_task_stream(
        "s_mnist", tasks(), cfg, hp, seed, log_dir, ls_init=ls_init,
        resume=resume, meta={"data_source": data.mnist_source(data_dir)},
        mesh=_make_mesh_arg(n_devices, model_parallel),
    )


def split_digits(
    epochs=500, M=20, lr=3e-3, batch_size=512, beta=10.0,
    n_f=10, n_var_samples=3, ep_var_mean=True, map_est_hypers=False,
    dkl=False, seed=None, eval_interval=10, patience=20, log_dir=None,
    n_tasks=5, ls_init=None, resume=False, eval_resample_per_batch=False,
    n_devices=None, model_parallel=None,
    phi_lr=None, phi_wd=0.0, freeze_phi=False,
):
    """Split-Digits: the Split-MNIST protocol (experiments/vargp.py:107-141)
    on sklearn's REAL 8x8 handwritten digits — runnable on zero-egress
    hosts, small enough for direct torch-reference parity runs
    (scripts/ref_digits.py).

    ``phi_lr``/``phi_wd``/``freeze_phi`` are the DKL stability-ablation
    knobs (no effect unless --dkl): separate feature-map lr, decoupled
    weight decay, and freeze-phi-after-task-0."""
    rng = np.random.default_rng(seed or 0)
    train_full = data.load_digits_dataset(train=True, seed=0)
    test_full = data.load_digits_dataset(train=False, seed=0)
    # ~20% of train as validation, stratified protocol as in split_mnist
    train_all, val_all = data.split_train_val(
        train_full, len(train_full) // 5, rng
    )

    def tasks():
        for t in range(n_tasks):
            train_set = data.filter_by_class(train_all, [2 * t, 2 * t + 1])
            val_set = data.filter_by_class(val_all, range(2 * t + 2))
            test_set = data.filter_by_class(test_full, range(2 * t + 2))
            yield train_set, val_set, test_set

    cfg = VARGPConfig(
        M=M, out_size=10, in_size=64, n_f=n_f, n_var_samples=n_var_samples,
        ep_var_mean=bool(ep_var_mean), map_est_hypers=bool(map_est_hypers),
        dkl=bool(dkl),
    )
    counts = np.bincount(train_all.targets, minlength=2 * n_tasks)
    max_train = int(max(counts[2 * t] + counts[2 * t + 1] for t in range(n_tasks)))
    max_eval_rows = max(
        max_train,
        len(val_all),
        len(test_full),
    )
    hp = TrainHyperparams(
        epochs=epochs, lr=lr, batch_size=batch_size, beta=beta,
        eval_interval=eval_interval, patience=patience,
        pad_tasks_to=n_tasks, pad_data_rows=max(batch_size, max_train),
        pad_eval_batches=-(-max_eval_rows // batch_size),
        eval_resample_per_batch=bool(eval_resample_per_batch),
        phi_lr=None if phi_lr is None else float(phi_lr),
        phi_weight_decay=float(phi_wd),
        freeze_phi_after_first=bool(freeze_phi),
    )
    return _run_task_stream(
        "s_digits", tasks(), cfg, hp, seed, log_dir, ls_init=ls_init,
        resume=resume, meta={"data_source": "sklearn-digits (real)"},
        mesh=_make_mesh_arg(n_devices, model_parallel),
    )


def permuted_mnist(
    data_dir=None, n_tasks=10, epochs=1000, M=100, lr=3.7e-3,
    batch_size=512, beta=1.64, n_f=10, n_var_samples=3, ep_var_mean=True,
    map_est_hypers=False, dkl=False, seed=None, eval_interval=10,
    patience=20, log_dir=None, ls_init=None, resume=False,
    padded_chain=False, n_devices=None, model_parallel=None,
):
    """Parity: experiments/vargp.py:143-186 — task 0 unpermuted; val/test
    accumulate all task variants seen so far (ConcatDataset protocol).

    ``padded_chain``: True compiles ONE program for all 10 tasks (every
    task pays full 10-task-chain cost per step); False (default) compiles
    per task, so task t's step costs scale with its real chain length —
    ~3x less total compute over the 10-task stream (sum of t^3 vs 10*T^3
    on the dominant factorization)."""
    rng = np.random.default_rng(seed or 0)
    mnist_train_full = data.load_mnist(data_dir, train=True)
    mnist_test_full = data.load_mnist(data_dir, train=False)
    train_all, val_all = data.split_train_val(mnist_train_full, 10000, rng)
    perms = data.make_permutations(n_tasks, 784, rng)

    from vargp_tpu.data.tasks import concat

    def tasks():
        val_seen, test_seen = [], []
        for t in range(n_tasks):
            train_set = data.apply_permutation(train_all, perms[t])
            val_seen.append(data.apply_permutation(val_all, perms[t]))
            test_seen.append(data.apply_permutation(mnist_test_full, perms[t]))
            yield train_set, concat(val_seen), concat(test_seen)

    cfg = VARGPConfig(
        M=M, out_size=10, in_size=784, n_f=n_f, n_var_samples=n_var_samples,
        ep_var_mean=bool(ep_var_mean), map_est_hypers=bool(map_est_hypers),
        dkl=bool(dkl),
    )
    max_eval_rows = n_tasks * max(len(val_all), len(mnist_test_full))
    hp = TrainHyperparams(
        epochs=epochs, lr=lr, batch_size=batch_size, beta=beta,
        eval_interval=eval_interval, patience=patience,
        pad_tasks_to=n_tasks if padded_chain else None,
        pad_data_rows=len(train_all),
        pad_eval_batches=(
            -(-max_eval_rows // batch_size) if padded_chain else None
        ),
    )
    return _run_task_stream(
        "p_mnist", tasks(), cfg, hp, seed, log_dir, ls_init=ls_init,
        resume=resume, meta={"data_source": data.mnist_source(data_dir)},
        mesh=_make_mesh_arg(n_devices, model_parallel),
    )


def _completed_sweep_acc(m_dir, n_tasks):
    """Recover a finished sweep point's metric from its metrics.jsonl.

    Returns the early-stopper-best final-task test accuracy (the exact
    value a fresh run's ``acc_summary`` would report — train.loop logs it
    as ``task{T-1}/test/acc_best``), or None if the run never reached the
    final task (incomplete => must be re-run)."""
    import json

    path = os.path.join(m_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return None
    want = f"task{n_tasks - 1}/test/acc_best"
    acc = None
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if rec.get("tag") == want:
                acc = rec["value"]
    return acc


def varying_m(
    ms=(20, 40, 60, 80, 100, 120, 140, 160, 180, 200),
    data_dir=None, epochs=500, lr=3e-3, batch_size=512, beta=10.0,
    seed=None, patience=20, log_dir=None, n_tasks=5, dataset="s_mnist",
    resume=False, **kwargs,
):
    """Inducing-point sweep: final average accuracy vs M
    (parity: mnist.ipynb cell 17, varying_M.csv — full 10-point grid
    M in {20, ..., 200}).

    ``dataset``: "s_mnist" (the reference protocol; surrogate MNIST on
    zero-egress hosts) or "s_digits" (REAL sklearn digits — the sweep
    with genuine accuracy-vs-M signal on this host).

    ``resume=True``: sweep points whose log dir already holds a completed
    run OF THE SAME CONFIGURATION (sweep_point.json matches; final-task
    ``test/acc_best`` in metrics.jsonl) are read back instead of
    re-trained, and partially-completed points resume from their
    checkpoint chain — a multi-hour 10-point sweep survives interruption
    at the cost of the finished prefix's file reads.  A point minted under
    a DIFFERENT config (e.g. a smoke run's --epochs=5 leftovers in the
    same log dir) is re-run, never silently recorded."""
    import json

    if dataset not in ("s_mnist", "s_digits"):
        raise ValueError(f"dataset={dataset!r}: expected s_mnist or s_digits")
    base = log_dir or _log_dir(f"varying_m_{dataset}" if dataset != "s_mnist" else "varying_m")
    results = {}
    for m in ms:
        m_dir = os.path.join(base, f"M{m}")
        point_cfg = dict(
            dataset=dataset, M=int(m), epochs=epochs, lr=lr,
            batch_size=batch_size, beta=beta, seed=seed, patience=patience,
            n_tasks=n_tasks,
        )
        stamp_path = os.path.join(m_dir, "sweep_point.json")
        if resume:
            stamp = None
            if os.path.exists(stamp_path):
                with open(stamp_path) as f:
                    stamp = json.load(f)
            acc = (
                _completed_sweep_acc(m_dir, n_tasks)
                if stamp == point_cfg
                else None
            )
            if acc is not None:
                results[int(m)] = float(acc)
                print(f"[varying_m] M={m}: resumed, final test acc {acc:.4f}")
                continue
        common = dict(
            epochs=epochs, M=int(m), lr=lr, batch_size=batch_size,
            beta=beta, seed=seed, patience=patience,
            log_dir=m_dir, n_tasks=n_tasks, resume=resume, **kwargs,
        )
        if dataset == "s_digits":
            _, summaries = split_digits(**common)
        else:
            _, summaries = split_mnist(data_dir=data_dir, **common)
        os.makedirs(m_dir, exist_ok=True)
        with open(stamp_path, "w") as f:
            json.dump(point_cfg, f, indent=2)
        final = summaries[-1] if summaries else {}
        acc = next(
            (v for k, v in final.items() if k.endswith("test/acc")), None
        )
        if acc is None:
            # every task reloaded from checkpoints (resume, no training):
            # the final summary is empty — recover the metric from the
            # run's own metrics file rather than silently recording 0.0
            acc = _completed_sweep_acc(m_dir, n_tasks)
        if acc is None:
            raise RuntimeError(
                f"varying_m M={m}: no final-task test accuracy in summaries"
                f" or {m_dir}/metrics.jsonl — refusing to record a bogus 0.0"
            )
        results[int(m)] = float(acc)
        print(f"[varying_m] M={m}: final test acc {acc:.4f}")
    os.makedirs(base, exist_ok=True)
    with open(os.path.join(base, "varying_M.json"), "w") as f:
        json.dump(results, f, indent=2)
    try:
        from vargp_tpu.experiments.plots import plot_accuracy_vs_m

        plot_accuracy_vs_m(results, out_path=os.path.join(base, "varying_M.png"))
    except ImportError:
        pass
    return results
