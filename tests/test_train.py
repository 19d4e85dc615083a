"""End-to-end training tests: toy 2-task continual VAR-GP on CPU.

This is the reference's de-facto golden test (notebooks/toy.ipynb): after
task 1, the model must still classify task-0 classes (no catastrophic
forgetting), and the ELBO must decrease during training.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vargp_tpu import data
from vargp_tpu.models.vargp import VARGPConfig
from vargp_tpu.train import (
    TrainHyperparams,
    compute_accuracy,
    compute_bwt,
    make_predict_fn,
    train_task,
)
from vargp_tpu.train.stopper import EarlyStopper


def test_early_stopper_semantics():
    s = EarlyStopper(patience=2, delta=1e-4)
    s(0.5, "a")
    assert s.info() == "a" and not s.is_done()
    s(0.5, "b")  # no improvement
    s(0.49, "c")  # worse
    assert s.is_done()
    assert s.info() == "a"
    # patience disabled
    s2 = EarlyStopper(patience=-1)
    for i in range(50):
        s2(0.1, i)
    assert not s2.is_done()
    assert s2.info() == 0


def test_compute_bwt():
    m = np.array([[0.9, 0.0], [0.8, 0.95]])
    np.testing.assert_allclose(compute_bwt(m), 0.8 - 0.9)


@pytest.mark.slow
def test_toy_two_task_continual_learning():
    toy = data.make_toy_dataset(seed=0)

    cfg = VARGPConfig(M=10, out_size=4, in_size=2, n_f=10, n_var_samples=3)
    hp = TrainHyperparams(
        epochs=160, lr=2e-2, batch_size=256, beta=1.0,
        eval_interval=40, patience=-1,
    )

    key = jax.random.key(0)
    chain = []
    accs = []
    for t in range(2):
        train_set = data.filter_by_class(toy, [2 * t, 2 * t + 1])
        eval_set = data.filter_by_class(toy, range(2 * t + 2))
        key, k_task = jax.random.split(key)
        params, info = train_task(
            k_task, t, train_set, eval_set, eval_set, cfg, hp,
            prev_chain=chain, seed=t,
        )
        chain.append(params)
        accs.append(info["acc_summary"][f"task{t}/test/acc"])

    # after task 0: classes {0,1} separable to high accuracy
    assert accs[0] > 0.9, f"task-0 accuracy too low: {accs[0]}"
    # after task 1: all four classes, including retained task-0 knowledge
    assert accs[1] > 0.8, f"task-1 (all classes) accuracy too low: {accs[1]}"

    # per-task retention: task-0 classes still classified after task 1
    predict = make_predict_fn(cfg)
    from vargp_tpu.models.vargp import freeze_task

    prev = tuple(freeze_task(p) for p in chain[:-1])
    task0_set = data.filter_by_class(toy, [0, 1])
    acc0_after = compute_accuracy(
        task0_set,
        lambda x: predict(chain[-1], prev, jnp.asarray(x), jax.random.key(7)),
        batch_size=256,
    )
    assert acc0_after > 0.85, f"catastrophic forgetting: {acc0_after}"
