"""Compute-op dispatch: XLA reference implementations with Pallas TPU
fast paths swapped in behind identical signatures.

Backend selection: ``vargp_tpu.ops.dispatch.set_backend("xla"|"pallas"|"auto")``
or env var ``VARGP_TPU_BACKEND``.  "auto" uses Pallas kernels on TPU
platforms and XLA elsewhere.
"""

from vargp_tpu.ops.dispatch import (
    get_backend,
    set_backend,
    rbf_gram,
    sq_dist,
    batched_cholesky,
)

__all__ = ["get_backend", "set_backend", "rbf_gram", "sq_dist", "batched_cholesky"]
