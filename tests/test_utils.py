"""Utility tests: metrics logger, profiling trace parser, prng."""

import json
import os

import numpy as np

from vargp_tpu.utils import MetricsLogger, seed_everything
from vargp_tpu.utils.profiling import parse_trace


def test_metrics_logger_jsonl(tmp_path):
    with MetricsLogger(str(tmp_path), tensorboard=False) as logger:
        logger.add_scalar("task0/loss/kl_u", 1.5, step=10)
        logger.add_scalar("task0/val/acc", 0.9, step=10)
    lines = open(tmp_path / "metrics.jsonl").read().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["tag"] == "task0/loss/kl_u" and rec["value"] == 1.5


def test_seed_everything_deterministic():
    k1, s1 = seed_everything(123)
    k2, s2 = seed_everything(123)
    assert s1 == s2 == 123
    import jax

    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(k1)), np.asarray(jax.random.key_data(k2))
    )
    k3, s3 = seed_everything(None)
    assert isinstance(s3, int)


def test_parse_trace_empty(tmp_path):
    assert parse_trace(str(tmp_path)) == {}


def test_parse_trace_excludes_region_parents(tmp_path):
    """A `while` region op's slice spans its body ops' slices in the XLA
    Ops row — parse_trace must not sum both (double-counts the scan
    body; this inflated the eval-pass device numbers ~2x before r4)."""
    import gzip
    import json as _json

    trace = {
        "traceEvents": [
            {"ph": "M", "pid": 1, "name": "process_name",
             "args": {"name": "/device:TPU:0"}},
            {"ph": "M", "pid": 1, "tid": 2, "name": "thread_name",
             "args": {"name": "XLA Ops"}},
            {"ph": "X", "pid": 1, "tid": 2, "name": "while.6",
             "ts": 0, "dur": 100},
            {"ph": "X", "pid": 1, "tid": 2, "name": "fusion.1",
             "ts": 10, "dur": 40},
            {"ph": "X", "pid": 1, "tid": 2, "name": "custom-call.2",
             "ts": 60, "dur": 30},
        ]
    }
    with gzip.open(tmp_path / "x.trace.json.gz", "wt") as f:
        _json.dump(trace, f)
    out = parse_trace(str(tmp_path))
    assert "while.6" not in out
    assert out["fusion.1"] == 0.04
    assert out["custom-call.2"] == 0.03


def test_checkpoint_roundtrip_and_structure_validation(tmp_path):
    """save_pytree stores path-keyed leaves; load_pytree round-trips and
    fails LOUDLY on a cfg mismatch (wrong M / dkl) instead of silently
    mis-assembling params."""
    import jax
    import jax.numpy as jnp
    import pytest

    from vargp_tpu.models import vargp as V
    from vargp_tpu.utils.checkpoint import (
        CheckpointStructureError,
        load_pytree,
        save_pytree,
    )

    key = jax.random.key(0)
    cfg = V.VARGPConfig(M=4, out_size=3, in_size=2)
    z = jnp.zeros((3, 4, 2))
    params, _ = V.init_params(key, z, cfg)
    path = str(tmp_path / "ckpt0.npz")
    save_pytree(path, params)

    loaded = load_pytree(path, params)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # wrong M -> shape mismatch, clear error
    cfg_bad = V.VARGPConfig(M=6, out_size=3, in_size=2)
    bad_template, _ = V.init_params(key, jnp.zeros((3, 6, 2)), cfg_bad)
    with pytest.raises(CheckpointStructureError, match="shape"):
        load_pytree(path, bad_template)

    # wrong dkl flag -> different leaf set, clear error
    cfg_dkl = V.VARGPConfig(M=4, out_size=3, in_size=2, dkl=True)
    dkl_template, _ = V.init_params(key, z, cfg_dkl)
    with pytest.raises(CheckpointStructureError, match="missing|legacy"):
        load_pytree(path, dkl_template)


def test_checkpoint_legacy_format_loads(tmp_path):
    """Round-1 order-keyed checkpoints (leaf_{i}) still load, with a count
    check."""
    import jax
    import jax.numpy as jnp
    import pytest

    from vargp_tpu.utils.checkpoint import CheckpointStructureError, load_pytree

    tree = {"a": jnp.arange(3.0), "b": jnp.ones((2, 2))}
    leaves = jax.tree_util.tree_leaves(tree)
    np.savez(
        str(tmp_path / "old.npz"),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )
    loaded = load_pytree(str(tmp_path / "old.npz"), tree)
    np.testing.assert_array_equal(np.asarray(loaded["a"]), np.arange(3.0))

    with pytest.raises(CheckpointStructureError, match="legacy"):
        load_pytree(str(tmp_path / "old.npz"), {"a": jnp.zeros(3)})
