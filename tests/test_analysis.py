"""Checkpoint chain round-trip + analysis protocol + plots."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vargp_tpu import data
from vargp_tpu.experiments import analysis, plots
from vargp_tpu.models import vargp as V
from vargp_tpu.train.loop import TrainHyperparams, train_task
from vargp_tpu.utils.checkpoint import load_pytree, save_chain


import functools


@functools.lru_cache(maxsize=2)
def _cached_chain(dkl=False):
    return _train_tiny_chain_impl(dkl)


def _train_tiny_chain(tmp_path, dkl=False):
    """Train once per dkl flag (cached); re-save ckpts into tmp_path."""
    chain, cfg, toy = _cached_chain(dkl)
    for t, params in enumerate(chain):
        save_chain(str(tmp_path), t, params)
    return chain, cfg, toy


def _train_tiny_chain_impl(dkl=False):
    toy = data.make_toy_dataset(seed=0)
    cfg = V.VARGPConfig(
        M=6, out_size=4, in_size=2, n_f=4, n_var_samples=2, dkl=dkl
    )
    hp = TrainHyperparams(
        epochs=20, lr=2e-2, batch_size=128, eval_interval=20, patience=-1
    )
    key = jax.random.key(0)
    chain = []
    for t in range(2):
        train_set = data.filter_by_class(toy, [2 * t, 2 * t + 1])
        seen = data.filter_by_class(toy, range(2 * t + 2))
        key, k = jax.random.split(key)
        params, _ = train_task(
            k, t, train_set, seen, seen, cfg, hp, prev_chain=chain, seed=t
        )
        chain.append(params)
    return chain, cfg, toy


@pytest.mark.slow
def test_checkpoint_chain_roundtrip(tmp_path):
    chain, cfg, _ = _train_tiny_chain(tmp_path)
    loaded = analysis.load_task_chain(str(tmp_path), 2, chain[0])
    for orig, got in zip(chain, loaded):
        for a, b in zip(
            jax.tree_util.tree_leaves(orig), jax.tree_util.tree_leaves(got)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_accuracy_entropy_matrices_and_plots(tmp_path):
    chain, cfg, toy = _train_tiny_chain(tmp_path)
    test_sets = [data.filter_by_class(toy, [2 * t, 2 * t + 1]) for t in range(2)]
    acc, ent = analysis.accuracy_entropy_matrices(
        chain, cfg, test_sets, n_f=8, n_var_samples=4, batch_size=128
    )
    assert acc.shape == (2, 2) and ent.shape == (2, 2)
    assert (acc >= 0).all() and (acc <= 1).all()
    assert (ent >= 0).all() and (ent <= 1.01).all()
    summary = analysis.summarize(acc, ent)
    assert "bwt" in summary and "final_avg_acc" in summary

    out = plots.plot_matrices(acc, ent, out_path=str(tmp_path / "m.png"))
    assert os.path.exists(out)


def test_toy_density_grid_and_plot(tmp_path):
    chain, cfg, toy = _train_tiny_chain(tmp_path)
    gx, gy, probs = analysis.toy_density_grid(
        chain, cfg, n=12, n_f=4, n_var_samples=2
    )
    assert probs.shape == (2, 12, 12, 4)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-3)
    out = plots.plot_toy_densities(
        gx, gy, probs, dataset=toy, out_path=str(tmp_path / "d.png")
    )
    assert os.path.exists(out)


@pytest.mark.slow
def test_analyze_toy_global_density(tmp_path):
    """Global-SVGP toy density deliverable (toy_global.ipynb cells 3-5):
    per-task grids from a grown-M checkpoint chain reload end to end.

    Slow tier: ~36 s of per-task compiles (the global model grows M so
    each task compiles its own block).  Fast-tier coverage of the global
    path lives in test_global_retrain.py (scanned-block vs per-batch
    update match, inducing-point growth); the >90% toy-training check is
    itself slow-tier; the minted density artifact is pinned by
    test_toy_global_forgetting_contrast_minted_artifacts."""
    from vargp_tpu.models import global_svgp as G
    from vargp_tpu.train import loop_global
    from vargp_tpu.train.loop import TrainHyperparams

    toy = data.make_toy_dataset(seed=0)
    hp = TrainHyperparams(
        epochs=20, lr=2e-2, batch_size=128, eval_interval=20, patience=-1
    )
    key = jax.random.key(0)
    prev_params = None
    for t in range(2):
        cfg = G.GlobalSVGPConfig(
            M=4 * (t + 1), out_size=4, in_size=2, n_f=4, n_var_samples=2
        )
        train_set = data.filter_by_class(toy, [2 * t, 2 * t + 1])
        seen = data.filter_by_class(toy, range(2 * t + 2))
        key, k_task = jax.random.split(key)
        prev_params, _ = loop_global.train_task(
            k_task, t, train_set, seen, seen, cfg, hp,
            prev_state=prev_params, seed=t,
        )
        save_chain(str(tmp_path), t, prev_params)

    summary = analysis.analyze_toy_global(
        str(tmp_path), n_tasks=2, M=4, n=10, n_f=4, n_var_samples=2
    )
    assert len(summary["density_retention"]) == 2
    assert all(0.0 <= r <= 1.0 for r in summary["density_retention"])
    grid = np.load(os.path.join(str(tmp_path), "density_grid.npz"))
    assert grid["probs"].shape == (2, 10, 10, 4)
    np.testing.assert_allclose(grid["probs"].sum(-1), 1.0, rtol=1e-3)
    assert os.path.exists(os.path.join(str(tmp_path), "toy_density.json"))


def test_analyze_smnist_global_matrix(tmp_path):
    """Global-baseline chain-reload T x T analysis — the matrix
    compare_methods overlays against VAR-GP's (mnist.ipynb cells 6/15
    protocol, single-global-posterior side): saved global checkpoints
    reload and evaluate over per-task S-MNIST test splits."""
    from vargp_tpu.models import global_svgp as G

    key = jax.random.key(0)
    cfg = G.GlobalSVGPConfig(M=4, out_size=10, in_size=784)
    z0 = jnp.zeros((cfg.out_size, cfg.M, cfg.in_size))
    for t in range(2):
        params, _ = G.init_params(jax.random.fold_in(key, t), z0, cfg)
        save_chain(str(tmp_path), t, params)

    summary = analysis.analyze_smnist_global(
        str(tmp_path), n_tasks=2, M=4, n_f=2, n_var_samples=2,
        out_json=str(tmp_path / "analysis.json"),
    )
    acc = np.asarray(summary["acc_matrix"])
    ent = np.asarray(summary["ent_matrix"])
    assert acc.shape == (2, 2) and ent.shape == (2, 2)
    assert np.all((acc >= 0.0) & (acc <= 1.0))
    assert np.all(ent >= 0.0)
    assert os.path.exists(tmp_path / "analysis.json")


@pytest.mark.slow
def test_dkl_training_runs(tmp_path):
    """Deep-kernel path end to end (warm-started phi across tasks)."""
    chain, cfg, toy = _train_tiny_chain(tmp_path, dkl=True)
    assert chain[0].phi is not None and chain[1].phi is not None
    seen = data.filter_by_class(toy, range(4))
    from vargp_tpu.train.loop import make_predict_fn
    from vargp_tpu.models.vargp import freeze_task

    predict = make_predict_fn(cfg)
    prev = tuple(freeze_task(p) for p in chain[:-1])
    probs = predict(chain[-1], prev, jnp.asarray(seen.data[:32]), jax.random.key(0))
    assert np.isfinite(np.asarray(probs)).all()


def test_plot_inducing_images(tmp_path):
    import numpy as np

    from vargp_tpu.experiments.plots import plot_inducing_images

    z = np.random.default_rng(0).random((3, 5, 784)).astype(np.float32)
    out = plot_inducing_images(z, str(tmp_path / "ind.png"))
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_compare_methods_external_baselines(tmp_path):
    """VCL-comparison hook (mnist.ipynb cells 6/15/19/24): external accuracy
    matrices in any supported format overlay against ours."""
    import json as _json
    import os

    import numpy as np

    from vargp_tpu.experiments.analysis import compare_methods

    rng = np.random.default_rng(0)
    ours = np.tril(0.95 + 0.05 * rng.random((4, 4)))
    vcl = np.tril(0.80 + 0.05 * rng.random((4, 4)))
    csv_path = tmp_path / "vcl.csv"
    np.savetxt(csv_path, vcl, delimiter=",")
    json_path = tmp_path / "ours.json"
    json_path.write_text(_json.dumps({"acc_matrix": ours.tolist()}))

    out = compare_methods(
        str(json_path),
        {"vcl": str(csv_path), "vcl_coreset": vcl},
        out_json=str(tmp_path / "cmp.json"),
        out_png=str(tmp_path / "cmp.png"),
    )
    assert set(out) == {"vargp_tpu", "vcl", "vcl_coreset"}
    assert out["vargp_tpu"]["final_avg_acc"] > out["vcl"]["final_avg_acc"]
    assert len(out["vcl"]["avg_acc_after_task"]) == 4
    assert os.path.getsize(tmp_path / "cmp.json") > 0
    assert os.path.getsize(tmp_path / "cmp.png") > 0


def test_compare_vcl_overlay(tmp_path):
    """The minted VCL-overlay driver (mnist.ipynb cells 6/19): our curves
    from analyze_* matrices, VCL curves from the external constants, one
    JSON + figure per dataset, provenance recorded."""
    import json as _json
    import os

    import numpy as np

    from vargp_tpu.experiments.analysis import compare_vcl

    rng = np.random.default_rng(0)
    sm = tmp_path / "sm.json"
    pm = tmp_path / "pm.json"
    sm.write_text(
        _json.dumps({"acc_matrix": np.tril(0.95 + 0.05 * rng.random((5, 5))).tolist()})
    )
    pm.write_text(
        _json.dumps({"acc_matrix": np.tril(0.95 + 0.05 * rng.random((10, 10))).tolist()})
    )
    out = compare_vcl(str(sm), str(pm), out_dir=str(tmp_path / "cmp"))
    assert "approximate digitization" in out["provenance_vcl"]
    for name, t in (("smnist", 5), ("pmnist", 10)):
        curves = out[name]["curves"]
        ours = curves["VAR-GP (ours, minted)"]
        assert len(ours) == t
        # every VCL curve has the right length and ends below ours here
        vcls = [v for k, v in curves.items() if k.startswith("vcl")]
        assert vcls and all(len(v) == t for v in vcls)
        assert os.path.getsize(tmp_path / "cmp" / f"vcl_overlay_{name}.png") > 0
    assert os.path.getsize(tmp_path / "cmp" / "vcl_overlay.json") > 0


def test_toy_density_retention_minted_artifact():
    """Numeric-grid regression on the COMMITTED toy deliverable
    (results/toy_full, full 5000-epoch budget — the quantitative form of
    the reference README's headline claim, README.md:14-18): task-0
    predictive density must be retained after task 1.

    density_retention[t] = mean true-class probability on task-0 training
    points after task t (analysis.analyze_toy)."""
    import json as _json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "results", "toy_full", "toy_density.json")
    if not os.path.exists(path):
        pytest.skip("minted toy_full artifacts not present")
    with open(path) as f:
        d = _json.load(f)
    r = d["density_retention"]
    assert len(r) == 2
    assert r[0] > 0.5  # confident on task 0 right after task 0
    # retention: density after task 1 within 5% of after task 0 (measured
    # drop on the minted run: 0.557 -> 0.548, i.e. 1.6%)
    assert r[1] > 0.95 * r[0]

    grid = np.load(os.path.join(repo, "results", "toy_full", "density_grid.npz"))
    assert grid["probs"].shape == (2, 60, 60, 4)
    np.testing.assert_allclose(
        grid["probs"].sum(-1), 1.0, atol=1e-3
    )  # valid per-point distributions


def test_toy_global_forgetting_contrast_minted_artifacts():
    """The paper's contrast as a numeric regression over BOTH committed
    deliverables (toy.ipynb vs toy_global.ipynb protocols): the global
    baseline must forget substantially more task-0 density than VAR-GP
    (minted: -15.1% vs -1.6%)."""
    import json as _json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p_var = os.path.join(repo, "results", "toy_full", "toy_density.json")
    p_glo = os.path.join(repo, "results", "toy_global_full", "toy_density.json")
    if not (os.path.exists(p_var) and os.path.exists(p_glo)):
        pytest.skip("minted toy artifacts not present")
    with open(p_var) as f:
        var = _json.load(f)["density_retention"]
    with open(p_glo) as f:
        glo = _json.load(f)["density_retention"]
    drop_var = 1.0 - var[1] / var[0]
    drop_glo = 1.0 - glo[1] / glo[0]
    assert drop_glo > 0.05  # the global baseline visibly forgets
    assert drop_glo > 3.0 * drop_var  # and much more than VAR-GP
