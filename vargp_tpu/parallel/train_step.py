"""Sharded training / prediction steps.

GSPMD-style: inputs are placed with NamedShardings (mesh.py) and the jitted
step lets XLA propagate shardings and insert collectives — psum-style
gradient reduction over "data", all-gather of per-class logits over
"model" at the softmax.  This is the idiomatic TPU scale-out of the ELBO
(vs. the reference's single-device loop, experiments/vargp.py:28-37).
"""

from functools import partial

import jax
import jax.numpy as jnp
import optax

from vargp_tpu.models import vargp as V


def make_sharded_update_fn(
    cfg: V.VARGPConfig, tx, beta: float, n_train: int, mesh
):
    """Identical math to train.loop.make_update_fn; the mesh rides along via
    input shardings.  Constrain the loss output to be fully replicated so
    every host sees the same scalar."""

    @partial(jax.jit, donate_argnums=(0, 1))
    def update(params, opt_state, prev, prior, x, y, w, key):
        def total_loss(p):
            klh, klu, nll = V.loss(p, prev, prior, x, y, key, cfg, weights=w)
            scale = n_train / jnp.maximum(jnp.sum(w), 1.0)
            return beta * klh + klu + scale * nll, (klh, klu, nll)

        (loss_val, aux), grads = jax.value_and_grad(total_loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_val, aux

    return update


def make_sharded_predict_fn(cfg: V.VARGPConfig):
    @jax.jit
    def predict(params, prev, x, key):
        return V.predict(params, prev, x, key, cfg)

    return predict
