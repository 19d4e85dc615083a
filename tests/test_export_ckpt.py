"""AOT export + orbax checkpoint backend tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vargp_tpu.kernels import default_prior
from vargp_tpu.models import vargp as V


def tiny_model():
    cfg = V.VARGPConfig(M=4, out_size=3, in_size=5, n_f=3, n_var_samples=2)
    key = jax.random.key(0)
    z = jax.random.normal(key, (3, 4, 5))
    params, _ = V.init_params(key, z, cfg)
    return params, cfg


def test_export_roundtrip(tmp_path):
    from vargp_tpu.utils.export import export_predictor, load_predictor

    params, cfg = tiny_model()
    path = str(tmp_path / "model.stablehlo")
    export_predictor(params, (), cfg, batch_size=8, path=path, n_f=4, n_var_samples=2)

    fn = load_predictor(path)
    x = jax.random.normal(jax.random.key(1), (8, 5))
    key = jax.random.key(2)
    probs = fn(x, key)
    p = np.asarray(probs)
    assert p.shape == (8, 3)
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-4)

    # matches the live predictor with the same key
    live = V.predict(params, (), x, key, cfg, n_f=4, n_var_samples=2)
    np.testing.assert_allclose(p, np.asarray(live), rtol=1e-4, atol=1e-5)


def test_orbax_roundtrip(tmp_path):
    ocp = pytest.importorskip("orbax.checkpoint")
    from vargp_tpu.utils.checkpoint import load_pytree_orbax, save_pytree_orbax

    params, _ = tiny_model()
    path = str(tmp_path / "ckpt_orbax")
    save_pytree_orbax(path, params)
    loaded = load_pytree_orbax(path, params)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_distributed_mesh_helper():
    from vargp_tpu.parallel.distributed import global_mesh, initialize

    initialize()  # no-op single process
    mesh = global_mesh()
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.size == len(jax.devices())
