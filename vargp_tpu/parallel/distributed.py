"""Multi-host / multi-slice initialization.

The reference has no distributed story (single process, SURVEY.md §2.3);
on TPU pods the standard recipe is ``jax.distributed.initialize`` (env-
driven on Cloud TPU) followed by a global mesh over all devices.  DP rides
DCN across slices; model-axis collectives stay on ICI within a slice.
"""

import jax

from vargp_tpu.parallel.mesh import make_mesh


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize the JAX distributed runtime (no-op if single-process or
    already initialized).  On Cloud TPU all arguments are auto-detected."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # already initialized, or single-process environment
        pass


def global_mesh(model_parallel: int | None = None):
    """("data", "model") mesh over every device in the job.  The data axis
    spans hosts/slices (DCN-friendly pure DP); the model axis should stay
    within a slice (ICI) — keep model_parallel <= devices-per-slice."""
    return make_mesh(
        n_devices=len(jax.devices()),
        model_parallel=model_parallel,
        devices=jax.devices(),
    )
