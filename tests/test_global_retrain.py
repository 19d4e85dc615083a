"""Global continual SVGP + VARGP-Retrain model tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vargp_tpu import data, gpmath
from vargp_tpu.kernels import default_prior
from vargp_tpu.models import global_svgp as G
from vargp_tpu.models import vargp_retrain as R


@pytest.mark.slow
def test_global_svgp_task0_loss_and_grads():
    toy = data.filter_by_class(data.make_toy_dataset(seed=0), [0, 1])
    cfg = G.GlobalSVGPConfig(M=8, out_size=4, in_size=2, n_f=4, n_var_samples=2)
    key = jax.random.key(0)
    z = jnp.asarray(toy.data[:8])[None].repeat(4, axis=0)
    params, prior = G.init_params(key, z, cfg)
    x = jnp.asarray(toy.data[:16])
    y = jnp.asarray(toy.targets[:16])

    def total(p):
        klh, klu, upr, nll = G.loss(p, None, prior, x, y, key, cfg)
        return klh + klu - upr + nll

    val, grads = jax.value_and_grad(total)(params)
    assert np.isfinite(float(val))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()


def test_global_scanned_block_matches_per_batch_updates():
    """make_device_train_fn_global (one compiled scan) must produce the
    SAME params as the per-batch make_update_fn path when the batch covers
    the whole dataset (row order inside a batch is loss-invariant, so the
    on-device shuffle cannot differ) and the step keys are aligned."""
    import optax

    from vargp_tpu.train.loop_global import (
        make_device_train_fn_global,
        make_update_fn,
    )

    cfg = G.GlobalSVGPConfig(M=6, out_size=4, in_size=2, n_f=4, n_var_samples=2)
    toy = data.filter_by_class(data.make_toy_dataset(seed=0), [0, 1])
    key = jax.random.key(3)
    B = 16
    x = jnp.asarray(toy.data[:B])
    y = jnp.asarray(toy.targets[:B])
    w = jnp.ones((B,), jnp.float32)
    z = jnp.asarray(toy.data[:6])[None].repeat(4, axis=0)
    params, prior = G.init_params(key, z, cfg)
    tx = optax.adam(1e-2)

    n_epochs = 3
    run = make_device_train_fn_global(cfg, tx, beta=1.0, batch_size=B,
                                      n_epochs=n_epochs)
    p1 = jax.tree_util.tree_map(jnp.copy, params)
    p1, _, loss1, _ = run(p1, tx.init(p1), None, prior, jnp.asarray(float(B)),
                          x, y, w, key)

    update = make_update_fn(cfg, tx, beta=1.0, n_train=B)
    p2 = jax.tree_util.tree_map(jnp.copy, params)
    o2 = tx.init(p2)
    for s in range(n_epochs):
        # the scanned block's step keys: fold_in(key, n_epochs + s)
        p2, o2, loss2, _ = update(p2, o2, None, prior, x, y, w,
                                  jax.random.fold_in(key, n_epochs + s))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    # in-batch row order differs (device shuffle), so f32 reduction order
    # inside the loss differs too: identical math, ~1e-5-scale rounding
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-4)


@pytest.mark.slow
def test_global_svgp_with_prev_regularizer():
    cfg = G.GlobalSVGPConfig(M=6, out_size=3, in_size=2, n_f=4, n_var_samples=2)
    rng = np.random.default_rng(0)
    key = jax.random.key(1)
    z_prev = jnp.asarray(rng.standard_normal((3, 4, 2)).astype(np.float32))
    prev = G.GlobalPrev(
        z=z_prev,
        u_mean=jnp.asarray(rng.standard_normal((3, 4, 1)).astype(np.float32)),
        u_tril=gpmath.vec2tril(
            jnp.asarray(rng.standard_normal((3, 10)).astype(np.float32))
        ),
    )
    z = jnp.asarray(rng.standard_normal((3, 6, 2)).astype(np.float32))
    params, prior = G.init_params(key, z, cfg)
    x = jnp.asarray(rng.standard_normal((12, 2)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, 12))

    klh, klu, upr, nll = jax.jit(
        lambda p: G.loss(p, prev, prior, x, y, key, cfg)
    )(params)
    for v in (klh, klu, upr, nll):
        assert np.isfinite(float(v))
    assert float(upr) != 0.0

    probs = G.predict(params, prev, x, key, cfg)
    assert probs.shape == (12, 3)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-4)


def test_global_grow_inducing():
    key = jax.random.key(0)
    rng = np.random.default_rng(1)
    prev_z = jnp.asarray(rng.standard_normal((3, 4, 2)).astype(np.float32))
    dat = jnp.asarray(rng.standard_normal((100, 2)).astype(np.float32))
    z = G.grow_inducing(key, prev_z, dat, M_new=7, out_size=3)
    assert z.shape == (3, 7, 2)
    np.testing.assert_allclose(np.asarray(z[:, :4]), np.asarray(prev_z))


@pytest.mark.slow
def test_global_trains_toy_task():
    """One-task global SVGP should learn the toy problem."""
    import optax

    toy = data.filter_by_class(data.make_toy_dataset(seed=0), [0, 1])
    cfg = G.GlobalSVGPConfig(M=10, out_size=2, in_size=2, n_f=8, n_var_samples=2)
    key = jax.random.key(0)
    # remap labels to {0,1}
    y_all = jnp.asarray(toy.targets)
    x_all = jnp.asarray(toy.data)
    z = G.select_inducing(key, x_all, cfg.M, cfg.out_size)
    params, prior = G.init_params(key, z, cfg)
    tx = optax.yogi(2e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, k):
        def total(p):
            klh, klu, upr, nll = G.loss(p, None, prior, x_all, y_all, k, cfg)
            return klh + klu - upr + nll

        g = jax.grad(total)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o

    for i in range(200):
        key, k = jax.random.split(key)
        params, opt = step(params, opt, k)

    probs = G.predict(params, None, x_all, key, cfg)
    acc = (np.asarray(probs).argmax(-1) == np.asarray(y_all)).mean()
    assert acc > 0.9, acc


@pytest.mark.slow
def test_global_grown_m_two_tasks_end_to_end():
    """The grown-M continual path (grow_per_task > 0): task 1 trains with a
    LARGER inducing set whose leading rows are task 0's, and the
    u_prev_reg term evaluates q_1 at task-0's smaller z (unequal sizes).
    Exercises loop_global.train_task end-to-end at grown sizes
    (reference semantics: train_utils_global.py:16-39, toy_global.py:34)."""
    from vargp_tpu.train.loop import TrainHyperparams
    from vargp_tpu.train import loop_global

    toy = data.make_toy_dataset(seed=0)
    hp = TrainHyperparams(
        epochs=400, lr=2e-2, batch_size=256, beta=1.0, eval_interval=100,
        patience=-1,
    )
    key = jax.random.key(0)
    prev_params = None
    accs = []
    for t, M_t in enumerate((8, 14)):  # grown: M_prev=8 != M=14
        cfg = G.GlobalSVGPConfig(
            M=M_t, out_size=4, in_size=2, n_f=6, n_var_samples=2
        )
        train_set = data.filter_by_class(toy, [2 * t, 2 * t + 1])
        seen = data.filter_by_class(toy, range(2 * t + 2))
        key, k_task = jax.random.split(key)
        prev_params, info = loop_global.train_task(
            k_task, t, train_set, seen, seen, cfg, hp,
            prev_state=prev_params, seed=t,
        )
        acc = info["acc_summary"][f"task{t}/test/acc"]
        assert np.isfinite(acc)
        accs.append(acc)
        # grown inducing set keeps its size
        assert prev_params.z.shape == (4, M_t, 2)
    # after 2 tasks the global model must still classify seen classes well
    assert accs[-1] > 0.6, accs


class TestRetrain:
    def _setup(self, with_prev: bool):
        rng = np.random.default_rng(3)
        cfg = R.RetrainConfig(M=5, out_size=3, in_size=2, n_f=4, n_var_samples=2)
        key = jax.random.key(0)
        f32 = np.float32
        prev_chain = ()
        if with_prev:
            prev_chain = (
                R.TaskRaw(
                    z=jnp.asarray(rng.standard_normal((3, 5, 2)).astype(f32)),
                    u_mean=jnp.asarray(rng.standard_normal((3, 5, 1)).astype(f32)),
                    u_tril_vec=jnp.asarray(rng.standard_normal((3, 15)).astype(f32)),
                ),
            )
        z = jnp.asarray(rng.standard_normal((3, 5, 2)).astype(f32))
        params, prior, frozen = R.init_params(key, z, cfg, prev_chain=prev_chain)
        x = jnp.asarray(rng.standard_normal((10, 2)).astype(f32))
        y = jnp.asarray(rng.integers(0, 3, 10))
        return params, prior, frozen, x, y, cfg, key

    @pytest.mark.slow
    def test_task0(self):
        params, prior, frozen, x, y, cfg, key = self._setup(False)
        klh, klu, nll = jax.jit(
            lambda p: R.loss(p, frozen, prior, x, y, key, cfg)
        )(params)
        for v in (klh, klu, nll):
            assert np.isfinite(float(v))

    @pytest.mark.slow
    def test_with_prev_grads_flow_to_retrained_params(self):
        params, prior, frozen, x, y, cfg, key = self._setup(True)

        def total(p):
            klh, klu, nll = R.loss(p, frozen, prior, x, y, key, cfg)
            return klh + klu + nll

        val, grads = jax.value_and_grad(total)(params)
        assert np.isfinite(float(val))
        # previous-task parameters must receive gradient (they are trainable)
        g_prev = grads.tasks[0]
        assert float(jnp.abs(g_prev.z).sum()) > 0
        assert float(jnp.abs(g_prev.u_mean).sum()) > 0
        assert float(jnp.abs(g_prev.u_tril_vec).sum()) > 0

    def test_predict(self):
        params, prior, frozen, x, y, cfg, key = self._setup(True)
        probs = R.predict(params, x, key, cfg)
        assert probs.shape == (10, 3)
        np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-4)
