"""Multi-host / multi-slice initialization.

The reference has no distributed story (single process, SURVEY.md §2.3);
on TPU pods the standard recipe is ``jax.distributed.initialize`` (env-
driven on Cloud TPU) followed by a global mesh over all devices.  DP rides
DCN across slices; model-axis collectives stay on ICI within a slice.
"""

import jax

from vargp_tpu.parallel.mesh import make_mesh


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize the JAX distributed runtime.

    Safe to call twice (second call is a no-op).  When the caller passes NO
    arguments and auto-detection finds no cluster environment, this degrades
    to single-process mode; but an EXPLICITLY requested multi-process setup
    that fails raises — a misconfigured pod run must not silently proceed
    single-process.
    """
    explicit = coordinator_address is not None or num_processes is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        msg = str(e).lower()
        # JAX's double-call message is "distributed.initialize should only
        # be called once." (jax._src.distributed); older/other paths say
        # "already initialized" — treat both as the documented no-op
        if "already initialized" in msg or "only be called once" in msg:
            return
        if explicit:
            # an explicitly requested multi-process setup that fails must
            # raise — a misconfigured pod run must not silently proceed
            # single-process
            raise
        # implicit call: auto-detection found no cluster env (or the
        # backend is already up in a single-process test session) —
        # single-process mode


def global_mesh(model_parallel: int | None = None):
    """("data", "model") mesh over every device in the job.  The data axis
    spans hosts/slices (DCN-friendly pure DP); the model axis should stay
    within a slice (ICI) — keep model_parallel <= devices-per-slice."""
    return make_mesh(
        n_devices=len(jax.devices()),
        model_parallel=model_parallel,
        devices=jax.devices(),
    )
