"""Post-hoc analysis — the reference notebooks' evaluation protocol as code.

Parity: notebooks/mnist.ipynb (T x T accuracy & normalized-entropy
matrices, BWT, cells 12/13/21/22) and notebooks/toy.ipynb (predictive-
density grid over [-3, 3]^2, cells 3-6).  Checkpoint chains are rebuilt
exactly the way the notebooks do: task t's model = [ckpt0..ckpt_{t-1}] +
ckpt_t (mnist.ipynb cell 12).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from vargp_tpu import data
from vargp_tpu.models import vargp as V
from vargp_tpu.train.metrics import compute_acc_ent, compute_bwt
from vargp_tpu.utils.checkpoint import load_pytree


def load_task_chain(log_dir: str, n_tasks: int, example_params):
    """Load [ckpt0..ckpt_{n-1}] saved by the experiment drivers."""
    return [
        load_pytree(os.path.join(log_dir, f"ckpt{t}.npz"), example_params)
        for t in range(n_tasks)
    ]


def accuracy_entropy_matrices(
    chain,
    cfg: V.VARGPConfig,
    test_sets,
    key=None,
    n_f: int = 50,
    n_var_samples: int = 20,
    batch_size: int = 512,
):
    """T x T accuracy and normalized-entropy matrices.

    Row t = model after task t (chain prefix), column s = test split of
    task s.  Entropy normalized by ln(out_size) (mnist.ipynb cell 21).
    Eval MC budget follows the notebooks (n_f=50, n_var_samples=20).
    """
    key = key if key is not None else jax.random.key(0)
    T = len(chain)
    acc = np.zeros((T, T))
    ent = np.zeros((T, T))

    from dataclasses import replace

    cfg_eval = replace(cfg, n_f=n_f, n_var_samples=n_var_samples)

    # padded-chain evaluation: every prefix evaluates through ONE compiled
    # predictor (chain length as a traced mask, not a shape)
    @jax.jit
    def _predict(params, prev, mask, x, k):
        return V.predict(params, prev, x, k, cfg_eval, chain_mask=mask)

    for t in range(T):
        prev, mask = V.pad_chain(
            tuple(V.freeze_task(p) for p in chain[:t]), cfg, t_max=T
        )
        params = chain[t]
        for s, test_set in enumerate(test_sets):
            key, k = jax.random.split(key)
            a, e = compute_acc_ent(
                test_set,
                lambda x: _predict(params, prev, mask, jnp.asarray(x), k),
                batch_size=batch_size,
            )
            acc[t, s] = a
            ent[t, s] = e / np.log(cfg.out_size)
    return acc, ent


def toy_density_grid(
    chain,
    cfg: V.VARGPConfig,
    lo: float = -3.0,
    hi: float = 3.0,
    n: int = 60,
    key=None,
    n_f: int = 100,
    n_var_samples: int = 20,
):
    """Per-class predictive probability surfaces over a 2-D grid after each
    task (toy.ipynb cells 3-6).  Returns (grid_x, grid_y, probs[T, n, n, C])."""
    key = key if key is not None else jax.random.key(0)
    xs = np.linspace(lo, hi, n, dtype=np.float32)
    gx, gy = np.meshgrid(xs, xs)
    pts = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], axis=-1))

    from dataclasses import replace

    cfg_eval = replace(cfg, n_f=n_f, n_var_samples=n_var_samples)

    @jax.jit
    def _predict(params, prev, x, k):
        return V.predict(params, prev, x, k, cfg_eval)

    out = []
    for t, params in enumerate(chain):
        prev = tuple(V.freeze_task(p) for p in chain[:t])
        key, k = jax.random.split(key)
        probs = np.asarray(_predict(params, prev, pts, k))
        out.append(probs.reshape(n, n, -1))
    return gx, gy, np.stack(out)


def analyze_toy(
    log_dir: str,
    n_tasks: int = 2,
    M: int = 20,
    out_json: str | None = None,
    n: int = 60,
    n_f: int = 100,
    n_var_samples: int = 20,
    data_seed: int = 0,
):
    """Toy predictive-density deliverable (toy.ipynb cells 3-6 /
    reference README.md:14-18): per-task density contour figure + a
    numeric density-retention summary from a toy checkpoint chain.

    density_retention[t] = mean predicted probability of the TRUE class
    over task-0's training points under the model AFTER task t — the
    quantitative version of "VAR-GP preserves task-0 predictive density
    across tasks; VCL forgets"."""
    cfg = V.VARGPConfig(M=M, out_size=4, in_size=2)
    key = jax.random.key(0)
    z = jnp.zeros((cfg.out_size, cfg.M, cfg.in_size))
    example, _ = V.init_params(key, z, cfg)
    chain = load_task_chain(log_dir, n_tasks, example)

    gx, gy, probs = toy_density_grid(
        chain, cfg, n=n, n_f=n_f, n_var_samples=n_var_samples
    )
    np.savez(
        os.path.join(log_dir, "density_grid.npz"), gx=gx, gy=gy, probs=probs
    )

    toy_all = data.make_toy_dataset(seed=data_seed)
    task0 = data.filter_by_class(toy_all, [0, 1])
    from dataclasses import replace

    cfg_eval = replace(cfg, n_f=n_f, n_var_samples=n_var_samples)

    retention = []
    for t, params in enumerate(chain):
        prev = tuple(V.freeze_task(p) for p in chain[:t])
        p = np.asarray(
            V.predict(
                params, prev, jnp.asarray(task0.data),
                jax.random.fold_in(key, 100 + t), cfg_eval,
            )
        )
        retention.append(
            float(np.mean(p[np.arange(len(task0)), task0.targets]))
        )

    summary = dict(
        density_retention=retention,
        task0_true_class_prob_final=retention[-1],
        grid_n=n, n_f=n_f, n_var_samples=n_var_samples,
    )
    out_json = out_json or os.path.join(log_dir, "toy_density.json")
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=2)
    try:
        from vargp_tpu.experiments.plots import plot_toy_densities

        plot_toy_densities(
            gx, gy, probs, dataset=toy_all,
            out_path=os.path.join(log_dir, "toy_density.png"),
        )
    except ImportError:
        pass
    print(json.dumps(summary))
    return summary


def analyze_toy_global(
    log_dir: str,
    n_tasks: int = 2,
    M: int = 20,
    out_json: str | None = None,
    n: int = 60,
    n_f: int = 50,
    n_var_samples: int = 20,
    data_seed: int = 0,
):
    """Global-SVGP toy density deliverable (toy_global.ipynb cells 3-5):
    per-class predictive surfaces over [-3, 3]^2 after each task for the
    single-global-posterior baseline, plus the same task-0 density-
    retention metric as analyze_toy — the quantitative side of the
    paper's contrast (VAR-GP preserves task-0 density; the global
    baseline forgets).

    The global model's M grows as M*(t+1) (toy_global.py:34), so the
    chain is loaded with per-task templates; predict needs only task t's
    params (the single global posterior IS the model — models_global.py
    predict :228 never touches prev)."""
    from dataclasses import replace

    from vargp_tpu.models import global_svgp as G
    from vargp_tpu.utils.checkpoint import load_chain

    key = jax.random.key(0)
    cfgs, templates = [], []
    for t in range(n_tasks):
        cfg_t = G.GlobalSVGPConfig(M=M * (t + 1), out_size=4, in_size=2)
        z0 = jnp.zeros((cfg_t.out_size, cfg_t.M, cfg_t.in_size))
        example, _ = G.init_params(key, z0, cfg_t)
        cfgs.append(cfg_t)
        templates.append(example)
    chain = load_chain(log_dir, n_tasks, templates)

    xs = np.linspace(-3.0, 3.0, n, dtype=np.float32)
    gx, gy = np.meshgrid(xs, xs)
    pts = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], axis=-1))

    toy_all = data.make_toy_dataset(seed=data_seed)
    task0 = data.filter_by_class(toy_all, [0, 1])
    x0 = jnp.asarray(task0.data)

    out, retention = [], []
    for t, params in enumerate(chain):
        cfg_eval = replace(cfgs[t], n_f=n_f, n_var_samples=n_var_samples)
        key, k_grid, k_ret = jax.random.split(key, 3)
        probs = np.asarray(
            jax.jit(G.predict, static_argnames="cfg")(
                params, None, pts, k_grid, cfg_eval
            )
        )
        out.append(probs.reshape(n, n, -1))
        p0 = np.asarray(G.predict(params, None, x0, k_ret, cfg_eval))
        retention.append(
            float(np.mean(p0[np.arange(len(task0)), task0.targets]))
        )

    probs = np.stack(out)
    np.savez(
        os.path.join(log_dir, "density_grid.npz"), gx=gx, gy=gy, probs=probs
    )
    summary = dict(
        density_retention=retention,
        task0_true_class_prob_final=retention[-1],
        grid_n=n, n_f=n_f, n_var_samples=n_var_samples,
    )
    out_json = out_json or os.path.join(log_dir, "toy_density.json")
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=2)
    try:
        from vargp_tpu.experiments.plots import plot_toy_densities

        plot_toy_densities(
            gx, gy, probs, dataset=toy_all,
            out_path=os.path.join(log_dir, "toy_density.png"),
        )
    except ImportError:
        pass
    print(json.dumps(summary))
    return summary


def summarize(acc: np.ndarray, ent: np.ndarray) -> dict:
    """Final summary dict: per-task final accs, mean final acc, BWT."""
    return dict(
        final_accs=acc[-1].tolist(),
        final_avg_acc=float(acc[-1].mean()),
        bwt=compute_bwt(acc),
        acc_matrix=acc.tolist(),
        ent_matrix=ent.tolist(),
    )


def analyze_smnist_global(
    log_dir: str,
    data_dir=None,
    n_tasks: int = 5,
    M: int = 60,
    grow_per_task: int = 0,
    out_json: str | None = None,
    n_f: int = 50,
    n_var_samples: int = 20,
    batch_size: int = 512,
):
    """Chain-reload T x T analysis for the global-SVGP S-MNIST baseline.

    Same protocol as analyze_smnist (mnist.ipynb cell 12: per-task test
    splits, notebook MC budgets) applied to the single-global-posterior
    ablation: row t = the global posterior after task t — ckpt_t ALONE,
    since global predict never conditions on earlier checkpoints
    (models_global.py:228 analogue; see models/global_svgp.py) — column
    s = task-s test split.  Produces the baseline matrix that
    compare_methods overlays against VAR-GP's (the reference notebooks'
    VCL/global comparison cells 6/15; upstream's own baseline artifacts
    are LFS stubs)."""
    from dataclasses import replace

    from vargp_tpu.models import global_svgp as G
    from vargp_tpu.utils.checkpoint import load_chain

    key = jax.random.key(0)
    cfgs, templates = [], []
    for t in range(n_tasks):
        cfg_t = G.GlobalSVGPConfig(
            M=M + grow_per_task * t, out_size=10, in_size=784
        )
        z0 = jnp.zeros((cfg_t.out_size, cfg_t.M, cfg_t.in_size))
        example, _ = G.init_params(key, z0, cfg_t)
        cfgs.append(cfg_t)
        templates.append(example)
    chain = load_chain(log_dir, n_tasks, templates)

    test_full = data.load_mnist(data_dir, train=False)
    test_sets = [
        data.filter_by_class(test_full, [2 * t, 2 * t + 1])
        for t in range(n_tasks)
    ]

    predict_jit = jax.jit(G.predict, static_argnames="cfg")
    acc = np.zeros((n_tasks, n_tasks))
    ent = np.zeros((n_tasks, n_tasks))
    for t in range(n_tasks):
        cfg_eval = replace(cfgs[t], n_f=n_f, n_var_samples=n_var_samples)
        for s, test_set in enumerate(test_sets):
            key, k = jax.random.split(key)
            a, e = compute_acc_ent(
                test_set,
                lambda x: predict_jit(
                    chain[t], None, jnp.asarray(x), k, cfg_eval
                ),
                batch_size=batch_size,
            )
            acc[t, s] = a
            ent[t, s] = e / np.log(cfg_eval.out_size)

    summary = summarize(acc, ent)
    out_json = out_json or os.path.join(log_dir, "analysis.json")
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=2)
    try:
        from vargp_tpu.experiments.plots import plot_matrices

        plot_matrices(acc, ent, os.path.join(log_dir, "matrices.png"))
    except ImportError:
        pass
    print(json.dumps({k: v for k, v in summary.items() if "matrix" not in k}))
    return summary


def compare_methods(
    ours: "np.ndarray | str",
    baselines: dict[str, "np.ndarray | str"],
    out_json: str | None = None,
    out_png: str | None = None,
) -> dict:
    """Compare our accuracy matrix against external baselines (e.g. VCL).

    Parity: mnist.ipynb cells 6/15/19/24 overlay VCL / VCL-coreset curves
    against VAR-GP.  Baselines the reference loaded from CSV artifacts are
    external here too: pass each as a T x T accuracy matrix (array, .json
    with an 'acc_matrix' key — e.g. any analyze_* output — .csv, or .npy).

    Returns {method: {avg_acc_after_task: [...], final_avg_acc, bwt}} and
    optionally writes the summary json + an avg-accuracy-vs-task plot.
    """
    mats = {"vargp_tpu": _load_acc_matrix(ours)}
    mats.update({k: _load_acc_matrix(v) for k, v in baselines.items()})
    out = {}
    for name, m in mats.items():
        t = m.shape[0]
        avg_after = [float(np.mean(m[i, : i + 1])) for i in range(t)]
        out[name] = dict(
            avg_acc_after_task=avg_after,
            final_avg_acc=avg_after[-1],
            bwt=compute_bwt(m),
        )
    if out_json:
        with open(out_json, "w") as f:
            json.dump(out, f, indent=2)
    if out_png:
        from vargp_tpu.experiments.plots import plot_method_comparison

        plot_method_comparison(
            {k: v["avg_acc_after_task"] for k, v in out.items()}, out_png
        )
    return out


def compare_vcl(
    smnist_json: str = "results/smnist_r4/analysis.json",
    pmnist_json: str = "results/pmnist_r4/analysis.json",
    out_dir: str = "results/compare",
) -> dict:
    """The notebooks' VCL-comparison overlay as a minted artifact
    (mnist.ipynb cells 6/19: avg-accuracy-after-task curves, VAR-GP vs
    VCL+coreset variants).

    Our curves come from minted analyze_* matrices; the VCL curves are
    external constants (experiments/external_baselines.py — approximate
    digitizations of arXiv:2006.05468 figures; upstream's own baseline
    CSVs are git-LFS stubs).  Writes comparison JSON + one figure per
    dataset under ``out_dir``."""
    from vargp_tpu.experiments import external_baselines as ext
    from vargp_tpu.experiments.plots import plot_method_comparison

    os.makedirs(out_dir, exist_ok=True)
    out = {"provenance_vcl": ext.PROVENANCE}
    for name, ours_json, vcl in (
        ("smnist", smnist_json, ext.VCL_SMNIST),
        ("pmnist", pmnist_json, ext.VCL_PMNIST),
    ):
        if not os.path.exists(ours_json):
            print(f"[compare_vcl] {name}: {ours_json} missing, skipped")
            continue
        m = _load_acc_matrix(ours_json)
        ours = [float(np.mean(m[i, : i + 1])) for i in range(m.shape[0])]
        curves = {"VAR-GP (ours, minted)": ours}
        curves.update(
            {f"{k} (paper, approx)": list(map(float, v)) for k, v in vcl.items()}
        )
        plot_method_comparison(
            curves, os.path.join(out_dir, f"vcl_overlay_{name}.png")
        )
        out[name] = dict(
            curves=curves,
            final={k: v[-1] for k, v in curves.items()},
            ours_source=ours_json,
        )
    path = os.path.join(out_dir, "vcl_overlay.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v["final"] for k, v in out.items() if isinstance(v, dict)}))
    return out


def _load_acc_matrix(src) -> np.ndarray:
    if isinstance(src, str):
        if src.endswith(".json"):
            with open(src) as f:
                d = json.load(f)
            src = d["acc_matrix"] if isinstance(d, dict) else d
        elif src.endswith(".npy"):
            src = np.load(src)
        elif src.endswith(".csv"):
            src = np.loadtxt(src, delimiter=",")
    m = np.asarray(src, dtype=np.float64)
    assert m.ndim == 2 and m.shape[0] == m.shape[1], m.shape
    return m


def analyze_pmnist(
    log_dir: str,
    data_dir=None,
    n_tasks: int = 10,
    M: int = 100,
    seed: int = 0,
    out_json: str | None = None,
    n_f: int = 50,
    n_var_samples: int = 20,
):
    """End-to-end Permuted-MNIST analysis: T x T accuracy/entropy matrices
    over the per-permutation test splits (seed must match the training run
    so the permutations agree — default 0 matches the p_mnist driver's
    effective default `seed or 0`; analyzing with the wrong seed rebuilds
    different permutations and yields near-chance off-diagonal cells)."""
    cfg = V.VARGPConfig(M=M, out_size=10, in_size=784)
    key = jax.random.key(0)
    z = jnp.zeros((cfg.out_size, cfg.M, cfg.in_size))
    example, _ = V.init_params(key, z, cfg)
    chain = load_task_chain(log_dir, n_tasks, example)

    rng = np.random.default_rng(seed)
    # replicate the driver's RNG consumption order (split before perms)
    train_full = data.load_mnist(data_dir, train=True)
    data.split_train_val(train_full, 10000, rng)
    perms = data.make_permutations(n_tasks, 784, rng)
    test_full = data.load_mnist(data_dir, train=False)
    test_sets = [data.apply_permutation(test_full, p) for p in perms]

    acc, ent = accuracy_entropy_matrices(
        chain, cfg, test_sets, n_f=n_f, n_var_samples=n_var_samples
    )
    summary = summarize(acc, ent)
    out_json = out_json or os.path.join(log_dir, "analysis.json")
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=2)
    try:
        from vargp_tpu.experiments.plots import plot_inducing_images, plot_matrices

        plot_matrices(acc, ent, os.path.join(log_dir, "matrices.png"))
        plot_inducing_images(
            chain[-1].z, os.path.join(log_dir, "inducing.png")
        )
    except ImportError:
        pass
    print(json.dumps({k: v for k, v in summary.items() if "matrix" not in k}))
    return summary


def analyze_sdigits(
    log_dir: str,
    n_tasks: int = 5,
    M: int = 20,
    dkl: bool = False,
    out_json: str | None = None,
    n_f: int = 50,
    n_var_samples: int = 20,
):
    """End-to-end Split-Digits analysis (real sklearn digits): T x T
    accuracy/entropy matrices over per-task test splits, notebook MC
    budgets (mnist.ipynb cell 12 protocol)."""
    cfg = V.VARGPConfig(M=M, out_size=10, in_size=64, dkl=bool(dkl))
    key = jax.random.key(0)
    z = jnp.zeros((cfg.out_size, cfg.M, cfg.in_size))
    example, _ = V.init_params(key, z, cfg)
    chain = load_task_chain(log_dir, n_tasks, example)

    test_full = data.load_digits_dataset(train=False, seed=0)
    test_sets = [
        data.filter_by_class(test_full, [2 * t, 2 * t + 1]) for t in range(n_tasks)
    ]
    acc, ent = accuracy_entropy_matrices(
        chain, cfg, test_sets, n_f=n_f, n_var_samples=n_var_samples
    )
    summary = summarize(acc, ent)
    out_json = out_json or os.path.join(log_dir, "analysis.json")
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=2)
    try:
        from vargp_tpu.experiments.plots import plot_inducing_images, plot_matrices

        plot_matrices(acc, ent, os.path.join(log_dir, "matrices.png"))
        plot_inducing_images(
            chain[-1].z, os.path.join(log_dir, "inducing.png"), img_shape=(8, 8)
        )
    except ImportError:
        pass
    print(json.dumps({k: v for k, v in summary.items() if "matrix" not in k}))
    return summary


def analyze_smnist(
    log_dir: str,
    data_dir=None,
    n_tasks: int = 5,
    M: int = 60,
    dkl: bool = False,
    out_json: str | None = None,
):
    """End-to-end S-MNIST analysis from a checkpoint directory."""
    cfg = V.VARGPConfig(M=M, out_size=10, in_size=784, dkl=bool(dkl))
    key = jax.random.key(0)
    z = jnp.zeros((cfg.out_size, cfg.M, cfg.in_size))
    example, _ = V.init_params(key, z, cfg)
    chain = load_task_chain(log_dir, n_tasks, example)

    test_full = data.load_mnist(data_dir, train=False)
    test_sets = [
        data.filter_by_class(test_full, [2 * t, 2 * t + 1]) for t in range(n_tasks)
    ]
    acc, ent = accuracy_entropy_matrices(chain, cfg, test_sets)
    summary = summarize(acc, ent)
    out_json = out_json or os.path.join(log_dir, "analysis.json")
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=2)
    try:
        from vargp_tpu.experiments.plots import plot_inducing_images, plot_matrices

        plot_matrices(acc, ent, os.path.join(log_dir, "matrices.png"))
        # mnist.ipynb cell 10: last task's learned inducing inputs as images
        plot_inducing_images(
            chain[-1].z, os.path.join(log_dir, "inducing.png")
        )
    except ImportError:
        pass
    print(json.dumps({k: v for k, v in summary.items() if "matrix" not in k}))
    return summary
