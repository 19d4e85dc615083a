"""Persistent XLA compilation cache wiring.

The chain-reload analyses recompile one large eval-predictor program per
process (~615 s measured at Split-Digits analysis shapes on the tunneled
v5e — scripts/compile_probe.py); the cache makes every rerun of the same
protocol start in seconds instead.  Verified to round-trip executables
over the axon tunnel backend (second process: 7.4 s -> 0.4 s compile).

Enabled by the CLI for ANALYSIS commands (analyze_*/compare_*) and by
bench.py — NOT for the training drivers: those dispatch a device block
asynchronously and compile the eval program while it is in flight, and
that compile+execute overlap deadlocks the axon tunnel client when the
persistent cache is active (reproduced 2026-08-21 — train drivers hang
at the first eval with zero CPU; identical runs with the cache off
complete).  bench.py and the analyze drivers compile and execute
strictly sequentially and are measured safe.  Knob contract (loud-fail,
same as VARGP_TPU_AR_FORM): VARGP_TPU_COMPILE_CACHE=off disables,
=<dir> picks the location, unset uses ~/.cache/vargp_tpu/xla.

Reference counterpart: none — torch eagerly dispatches; compile caching
is an XLA-model need.
"""

import os


def enable_compilation_cache() -> str | None:
    """Configure the JAX persistent compile cache; returns the directory
    used, or None when disabled.  Must run before first device use."""
    knob = os.environ.get("VARGP_TPU_COMPILE_CACHE", "")
    if knob.lower() in ("off", "0", "false"):
        return None
    cache_dir = knob or os.path.join(
        os.path.expanduser("~"), ".cache", "vargp_tpu", "xla"
    )
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # every analysis-scale compile is worth caching; the 2 s floor skips
    # only trivial helper programs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
