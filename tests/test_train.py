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


def test_early_stopper_lazy_payload():
    """A callable payload is invoked only on improvement — plateaued evals
    must not pay the snapshot cost."""
    calls = []

    def make(tag):
        def thunk():
            calls.append(tag)
            return tag

        return thunk

    s = EarlyStopper(patience=5)
    s(0.5, make("a"))
    s(0.5, make("b"))  # no improvement: thunk must NOT run
    s(0.7, make("c"))
    assert calls == ["a", "c"]
    assert s.info() == "c"


def test_scanned_eval_poisons_on_nan():
    """The scanned eval must surface NaN predictions as a NaN correct
    count (argmax of all-NaN probs is a valid index, so the count alone
    can never expose a diverged posterior)."""
    from vargp_tpu.models import vargp as V
    from vargp_tpu.train.loop import make_device_eval_fn

    cfg = VARGPConfig(M=4, out_size=3, in_size=2, n_f=2, n_var_samples=1)
    key = jax.random.key(0)
    z = jax.random.normal(key, (cfg.out_size, cfg.M, cfg.in_size))
    params, _ = V.init_params(key, z, cfg)
    xs = jnp.zeros((2, 8, cfg.in_size))
    ys = jnp.zeros((2, 8), jnp.int32)
    ws = jnp.ones((2, 8))
    chain_mask = jnp.ones((0,), jnp.float32)
    eval_acc = make_device_eval_fn(cfg)

    correct, total = eval_acc(params, (), chain_mask, xs, ys, ws, key)
    assert np.isfinite(float(correct))

    bad = params._replace(u_mean=params.u_mean * jnp.nan)
    correct, total = eval_acc(bad, (), chain_mask, xs, ys, ws, key)
    assert np.isnan(float(correct))


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


@pytest.mark.slow
def test_device_block_filled_layout_bit_exact(monkeypatch):
    """make_device_train_fn's filled-layout fast path (gather-free packed
    triangle inside the scan, rowmajor<->filled permutation at the dispatch
    boundary) must reproduce the rowmajor trajectory BIT-exactly: same
    losses, same final params and optimizer moments.

    Slow tier: compiles the device block twice (~23 s).  The layout's
    fwd/bwd bit-exactness and gather-freeness stay in the fast tier at the
    unit level (test_gpmath.test_filled_layout_bit_exact_and_gather_free)."""
    import sys

    sys.path.insert(0, "tests")
    from test_parallel import tiny_problem

    from vargp_tpu.models import vargp as V
    from vargp_tpu.train.loop import make_device_train_fn, make_optimizer

    params, prev, prior, cfg, x, y, w = tiny_problem(n_prev=1, seed=3)
    prev_padded, chain_mask = V.pad_chain(prev, cfg, t_max=3)
    hp = TrainHyperparams(lr=1e-2)
    key = jax.random.key(11)
    B = x.shape[0]
    data_x = jnp.concatenate([x, 0.5 * x])
    data_y = jnp.concatenate([y, y])
    data_w = jnp.concatenate([w, w])
    n_train = jnp.asarray(float(2 * B))

    results = {}
    for layout in ("rowmajor", "filled"):
        monkeypatch.setenv("VARGP_TPU_TRIL_LAYOUT", layout)
        tx = make_optimizer(hp)
        p = jax.tree_util.tree_map(jnp.copy, params)
        o = tx.init(p)
        run = make_device_train_fn(cfg, tx, beta=1.0, batch_size=B, n_epochs=3)
        p, o, loss, _ = run(
            p, o, prev_padded, prior, chain_mask, n_train,
            data_x, data_y, data_w, key,
        )
        results[layout] = (p, o, float(loss))

    assert results["rowmajor"][2] == results["filled"][2]
    for a, b in zip(
        jax.tree_util.tree_leaves(results["rowmajor"][:2]),
        jax.tree_util.tree_leaves(results["filled"][:2]),
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_train_tril_layout_env_validation(monkeypatch):
    from vargp_tpu.train.loop import _train_tril_layout

    monkeypatch.setenv("VARGP_TPU_TRIL_LAYOUT", "rowmajour")  # typo
    with pytest.raises(ValueError, match="VARGP_TPU_TRIL_LAYOUT"):
        _train_tril_layout()


def test_phi_optimizer_group():
    """DKL ablation knobs: default opt_state structure is unchanged; with
    phi knobs set, phi gets its own lr/decay and set_phi_update_scale(0)
    freezes ONLY phi — a runtime value, so no recompile between tasks."""
    import optax

    from vargp_tpu.models import vargp as V
    from vargp_tpu.train.loop import make_optimizer, set_phi_update_scale

    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (10, 8, 64))
    cfg = VARGPConfig(
        M=8, out_size=10, in_size=64, n_f=4, n_var_samples=2, dkl=True
    )
    params, _ = V.init_params(key, z, cfg)

    # default path: exact optax.yogi structure (checkpoint compatibility)
    tx0 = make_optimizer(TrainHyperparams(lr=3e-3))
    assert jax.tree_util.tree_structure(
        tx0.init(params)
    ) == jax.tree_util.tree_structure(optax.yogi(3e-3).init(params))

    hp = TrainHyperparams(
        lr=3e-3, phi_lr=3e-4, phi_weight_decay=1e-2,
        freeze_phi_after_first=True,
    )
    tx = make_optimizer(hp)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    up, _ = tx.update(grads, state, params)
    assert float(jnp.abs(up.phi.weights[0]).max()) > 0
    assert float(jnp.abs(up.u_mean).max()) > 0

    frozen = set_phi_update_scale(state, 0.0)
    upf, _ = tx.update(grads, frozen, params)
    assert float(jnp.abs(upf.phi.weights[0]).max()) == 0.0
    assert float(jnp.abs(upf.phi.biases[-1]).max()) == 0.0
    # non-phi updates unchanged by the freeze
    np.testing.assert_allclose(
        np.asarray(upf.u_mean), np.asarray(up.u_mean), rtol=0, atol=0
    )


def test_phi_freeze_after_first_in_train_task():
    """freeze_phi_after_first: task 1 trains with phi bit-identical to its
    task-0 warm start while the variational params still move."""
    key = jax.random.PRNGKey(0)
    toy = data.make_toy_dataset(seed=0)
    sets = [data.filter_by_class(toy, [2 * t, 2 * t + 1]) for t in range(2)]
    cfg = VARGPConfig(
        M=4, out_size=4, in_size=2, n_f=3, n_var_samples=2, dkl=True
    )
    hp = TrainHyperparams(
        epochs=4, lr=1e-2, batch_size=32, eval_interval=4, patience=10,
        freeze_phi_after_first=True,
    )
    p0, _ = train_task(key, 0, sets[0], sets[0], sets[0], cfg, hp, seed=0)
    p1, _ = train_task(
        key, 1, sets[1], sets[1], sets[1], cfg, hp, prev_chain=[p0], seed=0
    )
    for w0, w1 in zip(p0.phi.weights, p1.phi.weights):
        np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))
    assert not np.array_equal(np.asarray(p0.u_mean), np.asarray(p1.u_mean))
