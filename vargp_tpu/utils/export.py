"""AOT model export for serving.

A deployed VAR-GP classifier is a fixed prediction function (chain +
current params baked in, fixed eval MC budget).  ``jax.export`` serializes
the jitted predictor to StableHLO so serving hosts can load and run it
without the framework or retracing — the TPU-native analogue of shipping a
TorchScript/ONNX artifact.
"""

import os

import jax
import jax.numpy as jnp


def export_predictor(
    params,
    prev,
    cfg,
    batch_size: int,
    path: str,
    *,
    n_f: int = 50,
    n_var_samples: int = 20,
):
    """Serialize predict(x, key) -> (B, out) probabilities to ``path``.

    Parameters and the frozen chain are closure constants of the exported
    computation; inputs are (x: (B, D) f32, seed: uint32 pair as key).
    """
    from jax import export as jexport

    from vargp_tpu.models import vargp as V

    def predict(x, key):
        return V.predict(
            params, prev, x, key, cfg, n_f=n_f, n_var_samples=n_var_samples
        )

    x_spec = jax.ShapeDtypeStruct((batch_size, cfg.in_size), jnp.float32)
    key_spec = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)
    exported = jexport.export(jax.jit(predict))(x_spec, key_spec)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_predictor(path: str):
    """Load an exported predictor; returns a callable (x, key) -> probs."""
    from jax import export as jexport

    with open(path, "rb") as f:
        blob = f.read()
    exported = jexport.deserialize(bytearray(blob))
    return lambda x, key: exported.call(x, key)
