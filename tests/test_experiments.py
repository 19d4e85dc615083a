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


def test_completed_sweep_acc_readback(tmp_path):
    """Fast tier: the sweep-resume helper recovers exactly the final-task
    test/acc_best record (last occurrence wins) and returns None for
    incomplete or absent runs."""
    import json

    m_dir = tmp_path / "M20"
    m_dir.mkdir()
    rows = [
        {"tag": "task0/test/acc_best", "value": 0.5, "step": 10},
        {"tag": "task1/test/acc_best", "value": 0.7, "step": 10},
        {"tag": "task1/test/acc_best", "value": 0.9, "step": 20},
    ]
    with open(m_dir / "metrics.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    assert vargp_run._completed_sweep_acc(str(m_dir), n_tasks=2) == 0.9
    # run never reached the final task -> incomplete, must re-run
    assert vargp_run._completed_sweep_acc(str(m_dir), n_tasks=3) is None
    assert vargp_run._completed_sweep_acc(str(tmp_path / "M40"), 2) is None


def test_varying_m_no_silent_zero(tmp_path, monkeypatch):
    """A sweep point whose run yields an empty final summary (all tasks
    reloaded from checkpoints) must recover the metric from its metrics
    file — or raise — never record a bogus 0.0."""
    import json

    monkeypatch.setattr(vargp_run, "split_digits", lambda **kw: ([], [{}]))
    with pytest.raises(RuntimeError, match="refusing"):
        vargp_run.varying_m(
            ms=(4,), dataset="s_digits", n_tasks=2, log_dir=str(tmp_path)
        )
    m_dir = tmp_path / "M4"
    m_dir.mkdir(exist_ok=True)
    with open(m_dir / "metrics.jsonl", "w") as f:
        f.write(json.dumps({"tag": "task1/test/acc_best", "value": 0.9}) + "\n")
    r = vargp_run.varying_m(
        ms=(4,), dataset="s_digits", n_tasks=2, log_dir=str(tmp_path)
    )
    assert r[4] == 0.9


@pytest.mark.slow
def test_varying_m_resume(tmp_path):
    """Sweep resume: completed points are read back from their metrics
    (identical value), not re-trained; missing points run fresh."""
    r1 = vargp_run.varying_m(
        ms=(4,), dataset="s_digits", epochs=2, eval_interval=1,
        batch_size=256, seed=0, patience=-1, n_tasks=2,
        log_dir=str(tmp_path),
    )
    # drop the sweep summary so only the per-M artifacts remain, then
    # resume with one finished + one fresh point
    os.remove(tmp_path / "varying_M.json")
    mtime = os.path.getmtime(tmp_path / "M4" / "metrics.jsonl")
    r2 = vargp_run.varying_m(
        ms=(4, 6), dataset="s_digits", epochs=2, eval_interval=1,
        batch_size=256, seed=0, patience=-1, n_tasks=2,
        log_dir=str(tmp_path), resume=True,
    )
    assert r2[4] == r1[4]
    assert os.path.getmtime(tmp_path / "M4" / "metrics.jsonl") == mtime
    assert 0.0 <= r2[6] <= 1.0
    assert os.path.exists(tmp_path / "varying_M.json")


def test_regression_driver(tmp_path):
    from vargp_tpu.experiments.regression import regression

    _, rmse = regression(epochs=300, M=16, seed=0, log_dir=str(tmp_path))
    assert rmse < 0.3, rmse
