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
