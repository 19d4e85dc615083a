"""Mesh construction and sharding rules.

Sharding policy (see package docstring):
  - class-batched GP state (z, u_mean, u_tril*, per-task chain entries and
    their optimizer moments): first axis (out_size) over "model"
  - kernel hyperparameters / MLP feature map: replicated
  - data batches: leading (batch) axis over "data"
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    model_parallel: int | None = None,
    devices=None,
) -> Mesh:
    """2-D ("data", "model") mesh over the first n_devices devices.

    model_parallel defaults to 2 when the device count is even (exercises
    both axes), else 1.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(
            f"requested n_devices={n} but only {len(devices)} JAX device(s) "
            f"are visible ({[str(d) for d in devices]}); on a single-chip "
            "host use XLA_FLAGS=--xla_force_host_platform_device_count=N "
            "with the cpu platform to emulate a mesh"
        )
    devices = devices[:n]
    if model_parallel is None:
        model_parallel = 2 if n % 2 == 0 and n > 1 else 1
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def _is_class_batched(path_str: str, leaf, out_size: int) -> bool:
    if "kernel" in path_str or "phi" in path_str:
        return False
    return getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == out_size


def infer_param_shardings(tree, mesh: Mesh, out_size: int):
    """Shardings for any params-shaped pytree (incl. optimizer states whose
    moment pytrees mirror the param structure)."""

    def spec(path, leaf):
        path_str = jax.tree_util.keystr(path)
        if _is_class_batched(path_str, leaf, out_size):
            return NamedSharding(mesh, P("model", *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, tree)


def batch_shardings(mesh: Mesh):
    """(x, y, w) shardings: batch axis over "data"."""
    return (
        NamedSharding(mesh, P("data", None)),
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P("data")),
    )


def _global_put(leaf, sh: NamedSharding):
    """Place one leaf under ``sh``, multi-process safe.

    ``jax.device_put`` rejects shardings that span non-addressable devices
    (other hosts in a jax.distributed job).  The supported recipes, by
    leaf kind:
      - already a global jax.Array with remote shards -> jit identity
        with out_shardings (inserts the reshard collective);
      - PRNG key array -> unwrap to raw uint32 (key_data), place that,
        re-wrap (make_array_from_callback can't see extended dtypes);
      - host value / process-local array -> make_array_from_callback,
        every process contributing its addressable shards from the SAME
        host value (the drivers guarantee identical values per process:
        same seeds, same dataset construction).
    """
    if sh.is_fully_addressable:
        return jax.device_put(leaf, sh)
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        return jax.jit(lambda x: x, out_shardings=sh)(leaf)
    if isinstance(leaf, jax.Array) and jax.dtypes.issubdtype(
        leaf.dtype, jax.dtypes.prng_key
    ):
        raw = np.asarray(jax.random.key_data(leaf))
        raw_sh = NamedSharding(sh.mesh, P(*sh.spec, *([None] * (raw.ndim - leaf.ndim))))
        raw_g = jax.make_array_from_callback(raw.shape, raw_sh, lambda i: raw[i])
        return jax.random.wrap_key_data(raw_g, impl=jax.random.key_impl(leaf))
    arr = np.asarray(leaf)
    return jax.make_array_from_callback(arr.shape, sh, lambda i: arr[i])


def shard_params(tree, mesh: Mesh, out_size: int):
    return jax.tree_util.tree_map(
        _global_put, tree, infer_param_shardings(tree, mesh, out_size)
    )


def shard_batch(x, y, w, mesh: Mesh):
    sx, sy, sw = batch_shardings(mesh)
    return (_global_put(x, sx), _global_put(y, sy), _global_put(w, sw))


def replicate(tree, mesh: Mesh):
    """Place every leaf fully replicated over the mesh (datasets, scalars,
    PRNG keys — anything without a shardable leading axis)."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda leaf: _global_put(leaf, sh), tree)


def unshard_to_host(tree, mesh: Mesh):
    """Gather a (possibly cross-process) sharded pytree to identical host
    (numpy) copies on every process.

    ``np.asarray`` on a model/data-sharded leaf raises under multi-process
    ``jax.distributed`` — its non-addressable shards live on other hosts.
    A jit identity with fully-replicated out_shardings inserts the
    all-gather; afterwards every process holds every leaf locally and the
    host fetch is pure-local.  COLLECTIVE: every process in the job must
    call this (the lead-gated checkpoint write happens after, host-side).
    """
    sh = jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), tree)
    gathered = jax.jit(lambda t: t, out_shardings=sh)(tree)
    return jax.device_get(gathered)
