"""GSPMD partitioning rules for the batch-parallel kernel ops
(ops/partition.py).

On the 8-CPU test platform the partitioned wrappers execute their XLA
reference bodies, so these tests exercise the *partitioning rule* (the
thing a real pod relies on) end to end: sharding propagation, shard-local
lowering, and numerical equality with the unpartitioned path.  The Mosaic
kernel bodies themselves are covered by tests/test_pallas.py.

No reference counterpart: the reference is single-device (SURVEY §2.3).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vargp_tpu.ops import dispatch
from vargp_tpu.ops.partition import (
    diag_chol_partitioned,
    partition_enabled,
    sym_gram_partitioned,
)


@pytest.fixture
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))


def _sym_inputs(H=3, O=10, M=32, D=7):
    z = jax.random.normal(jax.random.PRNGKey(0), (O, M, D))
    invs = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (H, D))) + 0.3
    g2 = jnp.exp(jax.random.normal(jax.random.PRNGKey(2), (H,)))
    return z, invs, g2


def _spd(batch, S, scale=3.0):
    A = jax.random.normal(jax.random.PRNGKey(3), (*batch, S, S))
    K = jnp.einsum("...ud,...vd->...uv", A, A) / S
    return K + scale * jnp.eye(S)


def test_partition_enabled_env_validation(monkeypatch):
    monkeypatch.setenv("VARGP_TPU_PARTITION_KERNELS", "bogus")
    with pytest.raises(ValueError):
        partition_enabled()
    monkeypatch.setenv("VARGP_TPU_PARTITION_KERNELS", "0")
    assert partition_enabled() is False
    monkeypatch.setenv("VARGP_TPU_PARTITION_KERNELS", "1")
    assert partition_enabled() is True
    monkeypatch.setenv("VARGP_TPU_PARTITION_KERNELS", "auto")
    assert partition_enabled() == (jax.device_count() > 1)


def test_sym_gram_partitioned_matches_and_stays_sharded(mesh, monkeypatch):
    z, invs, g2 = _sym_inputs()
    monkeypatch.setenv("VARGP_TPU_PARTITION_KERNELS", "0")
    ref = jax.jit(lambda *a: dispatch.sym_gram(*a))(z, invs, g2)
    monkeypatch.setenv("VARGP_TPU_PARTITION_KERNELS", "auto")
    zs = jax.device_put(z, NamedSharding(mesh, P("model", None, None)))
    out = jax.jit(lambda *a: dispatch.sym_gram(*a))(zs, invs, g2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
    # class axis stays sharded over "model"; each shard holds O/2 classes
    assert out.sharding.spec[1] == "model"
    assert out.addressable_shards[0].data.shape[1] == z.shape[0] // 2


def test_sym_gram_partitioned_gradients(mesh, monkeypatch):
    z, invs, g2 = _sym_inputs()

    def loss(z_, invs_, g2_):
        return jnp.sum(jnp.sin(dispatch.sym_gram(z_, invs_, g2_)))

    monkeypatch.setenv("VARGP_TPU_PARTITION_KERNELS", "0")
    gref = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(z, invs, g2)
    monkeypatch.setenv("VARGP_TPU_PARTITION_KERNELS", "auto")
    zs = jax.device_put(z, NamedSharding(mesh, P("model", None, None)))
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(zs, invs, g2)
    for a, b in zip(g, gref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


def test_sym_gram_partitioned_inside_scan(mesh, monkeypatch):
    """The production train loop calls sym_gram inside lax.scan bodies —
    the partitioned custom call must partition there too."""
    monkeypatch.setenv("VARGP_TPU_PARTITION_KERNELS", "auto")
    z, invs, g2 = _sym_inputs()
    zs = jax.device_put(z, NamedSharding(mesh, P("model", None, None)))

    def body(c, _):
        return c + jnp.sum(dispatch.sym_gram(zs, invs, g2)), None

    total, _ = jax.jit(lambda: jax.lax.scan(body, 0.0, None, length=3))()
    expect = 3.0 * jnp.sum(dispatch.sym_gram(z, invs, g2))
    np.testing.assert_allclose(float(total), float(expect), rtol=1e-5)


def test_rbf_gram_partitioned_matches_and_stays_sharded(mesh, monkeypatch):
    """The generic Gram (the DKL Kzz path): kernels.rbf.gram pre-scales
    to (H, O, M, D); the class axis must stay sharded through it."""
    theta = jax.random.normal(jax.random.PRNGKey(4), (3, 8)) * 0.1
    z = jax.random.normal(jax.random.PRNGKey(5), (10, 16, 7))
    from vargp_tpu.kernels import rbf

    monkeypatch.setenv("VARGP_TPU_PARTITION_KERNELS", "0")
    ref = jax.jit(lambda t, z_: rbf.gram(t, z_))(theta, z)
    gref = jax.jit(
        jax.grad(lambda z_: jnp.sum(jnp.cos(rbf.gram(theta, z_))))
    )(z)
    monkeypatch.setenv("VARGP_TPU_PARTITION_KERNELS", "auto")
    zs = jax.device_put(z, NamedSharding(mesh, P("model", None, None)))
    out = jax.jit(lambda t, z_: rbf.gram(t, z_))(theta, zs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
    assert out.sharding.spec[1] == "model"
    g = jax.jit(jax.grad(lambda z_: jnp.sum(jnp.cos(rbf.gram(theta, z_)))))(zs)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(gref), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("batch", [(6,), (3, 10)])
def test_diag_chol_partitioned_ranks(mesh, batch):
    K = _spd(batch, 128)
    ref = jnp.linalg.cholesky(K)
    ax = ("model",) + (None,) * (len(batch) - 1) if len(batch) == 1 else (
        None, "model")
    Ks = jax.device_put(K, NamedSharding(mesh, P(*ax, None, None)))
    out = jax.jit(diag_chol_partitioned)(Ks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
    assert tuple(out.sharding.spec)[: len(batch)] == tuple(ax)


def test_chol_and_inv_blocked_partitioned(mesh, monkeypatch):
    """The flagship factorization path (blocked split + diag-chol +
    NS inverse) under a class-sharded operand matches the unsharded run
    exactly and keeps its batch sharding."""
    K = _spd((3, 10), 300)
    monkeypatch.setenv("VARGP_TPU_PARTITION_KERNELS", "0")
    L0, X0 = jax.jit(dispatch.chol_and_inv)(K)
    monkeypatch.setenv("VARGP_TPU_PARTITION_KERNELS", "auto")
    Ks = jax.device_put(K, NamedSharding(mesh, P(None, "model", None, None)))
    L1, X1 = jax.jit(dispatch.chol_and_inv)(Ks)
    np.testing.assert_array_equal(np.asarray(L1), np.asarray(L0))
    np.testing.assert_array_equal(np.asarray(X1), np.asarray(X0))


def test_cross_gram_partitioned_matches_and_stays_sharded(mesh, monkeypatch):
    """The predictive Kzx rule: class axis over "model", data batch over
    "data" — shard-local blocks, no communication, grads intact."""
    from vargp_tpu.kernels import cross_gram

    rng = np.random.default_rng(23)
    H, O, M, B, D = 3, 10, 8, 16, 5
    theta = jnp.asarray(rng.standard_normal((H, D + 1)).astype(np.float32) * 0.2)
    z = jnp.asarray(rng.standard_normal((O, M, D)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))

    monkeypatch.setenv("VARGP_TPU_PARTITION_KERNELS", "0")
    ref = jax.jit(lambda *a: cross_gram(*a))(theta, z, x)
    gref = jax.jit(
        jax.grad(lambda z_: jnp.sum(jnp.sin(cross_gram(theta, z_, x))))
    )(z)

    monkeypatch.setenv("VARGP_TPU_PARTITION_KERNELS", "auto")
    zs = jax.device_put(z, NamedSharding(mesh, P("model", None, None)))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    out = jax.jit(lambda *a: cross_gram(*a))(theta, zs, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
    assert out.sharding.spec[1] == "model"
    assert out.sharding.spec[3] == "data"
    g = jax.jit(
        jax.grad(lambda z_: jnp.sum(jnp.sin(cross_gram(theta, z_, xs))))
    )(zs)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref), rtol=2e-4, atol=2e-4)


def test_sym_gram_no_allgather_of_sharded_class_axis(mesh, monkeypatch):
    """The point of the rule: the compiled module must not gather the
    class-sharded operand back to full size before the Gram."""
    monkeypatch.setenv("VARGP_TPU_PARTITION_KERNELS", "auto")
    z, invs, g2 = _sym_inputs()
    zsh = NamedSharding(mesh, P("model", None, None))
    fn = jax.jit(
        lambda *a: dispatch.sym_gram(*a), in_shardings=(zsh, None, None)
    )
    txt = fn.lower(z, invs, g2).compile().as_text()
    assert "all-gather" not in txt, "class axis was gathered — rule inactive"
