"""Sharded training / prediction steps.

GSPMD-style: inputs are placed with NamedShardings (mesh.py) and the jitted
step lets XLA propagate shardings and insert collectives — psum-style
gradient reduction over "data", all-gather of per-class logits over
"model" at the softmax.  This is the idiomatic TPU scale-out of the ELBO
(vs. the reference's single-device loop, experiments/vargp.py:28-37).

The update math is NOT re-implemented here: every builder wraps
``train.loop.elbo_step`` / ``train.loop.make_device_train_fn`` so the
sharded path runs the exact production program (padded chain, chain_mask,
scanned device-resident blocks) — only the placement differs.
"""

from functools import partial

import jax

from vargp_tpu.models import vargp as V
from vargp_tpu.train.loop import elbo_step, make_device_train_fn


def make_sharded_update_fn(
    cfg: V.VARGPConfig, tx, beta: float, n_train: int, mesh
):
    """Per-batch sharded ELBO step: the mesh rides along via the input
    shardings (shard_params / shard_batch); XLA propagates them and inserts
    the collectives.  Supports padded-chain mode via ``chain_mask``."""

    @partial(jax.jit, donate_argnums=(0, 1))
    def update(params, opt_state, prev, prior, x, y, w, key, chain_mask=None):
        return elbo_step(
            params, opt_state, prev, prior, x, y, w, key,
            cfg=cfg, tx=tx, beta=beta, n_train=n_train, chain_mask=chain_mask,
        )

    return update


def make_sharded_device_train_fn(
    cfg: V.VARGPConfig, tx, beta: float, batch_size: int, n_epochs: int, mesh
):
    """The production training block (train.loop.make_device_train_fn:
    on-device shuffling + batching + n_epochs of updates in ONE program),
    GSPMD-sharded over the mesh.  The dataset stays replicated; each
    gathered minibatch is constrained batch-sharded over "data"; params
    keep their class-axis "model" sharding from their input placement."""
    return make_device_train_fn(cfg, tx, beta, batch_size, n_epochs, mesh=mesh)


def make_sharded_predict_fn(cfg: V.VARGPConfig):
    @jax.jit
    def predict(params, prev, x, key, chain_mask=None):
        return V.predict(params, prev, x, key, cfg, chain_mask=chain_mask)

    return predict
