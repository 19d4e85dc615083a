"""Experiment driver tests with tiny budgets (CPU)."""

import os

import numpy as np
import pytest

from vargp_tpu.experiments import global_run, vargp_run


def test_toy_driver_tiny(tmp_path):
    chain, summaries = vargp_run.toy(
        epochs=4, M=6, eval_interval=2, batch_size=128, seed=0,
        log_dir=str(tmp_path), n_tasks=2,
    )
    assert len(chain) == 2
    assert os.path.exists(tmp_path / "ckpt0.npz")
    assert os.path.exists(tmp_path / "ckpt1.npz")
    assert os.path.exists(tmp_path / "metrics.jsonl")
    assert len(summaries) == 2


@pytest.mark.slow
def test_smnist_driver_tiny(tmp_path):
    chain, summaries = vargp_run.split_mnist(
        epochs=1, M=4, eval_interval=1, batch_size=4096, seed=0,
        n_f=2, n_var_samples=1, patience=-1,
        log_dir=str(tmp_path), n_tasks=2,
    )
    assert len(chain) == 2
    acc = summaries[0].get("task0/test/acc", 0)
    assert 0.0 <= acc <= 1.0


@pytest.mark.slow
def test_pmnist_driver_tiny(tmp_path):
    chain, summaries = vargp_run.permuted_mnist(
        epochs=1, M=4, eval_interval=1, batch_size=4096, seed=0,
        n_f=2, n_var_samples=1, patience=-1,
        log_dir=str(tmp_path), n_tasks=2,
    )
    assert len(chain) == 2


@pytest.mark.slow
def test_global_smnist_driver_tiny(tmp_path):
    _, summaries = global_run.split_mnist(
        epochs=1, M=4, eval_interval=1, batch_size=4096, seed=0,
        n_f=2, n_var_samples=1, patience=-1,
        log_dir=str(tmp_path), n_tasks=2,
    )
    assert len(summaries) == 2


@pytest.mark.slow
def test_toy_driver_resume(tmp_path):
    """Crash-resume: rerunning with resume=True skips completed tasks and
    produces a usable chain."""
    chain1, _ = vargp_run.toy(
        epochs=4, M=6, eval_interval=2, batch_size=128, seed=0,
        log_dir=str(tmp_path), n_tasks=2,
    )
    chain2, summaries = vargp_run.toy(
        epochs=4, M=6, eval_interval=2, batch_size=128, seed=0,
        log_dir=str(tmp_path), n_tasks=2, resume=True,
    )
    assert len(chain2) == 2
    import jax
    import numpy as np

    for a, b in zip(
        jax.tree_util.tree_leaves(chain1[0]), jax.tree_util.tree_leaves(chain2[0])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_regression_driver(tmp_path):
    from vargp_tpu.experiments.regression import regression

    _, rmse = regression(epochs=300, M=16, seed=0, log_dir=str(tmp_path))
    assert rmse < 0.3, rmse
