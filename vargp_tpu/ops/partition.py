"""GSPMD partitioning rules for the batch-parallel kernel ops.

``pallas_call`` has no SPMD partitioning rule: inside a jit over a
multi-device mesh XLA treats the Mosaic custom call as opaque and
*replicates* it — all-gather the operands, compute the FULL batch on
every device, slice the shard back out.  The ops wrapped here are
embarrassingly parallel over their leading (hyper, class) batch axes —
exactly the axes ``parallel.mesh`` shards over "model" — so we register
``jax.experimental.custom_partitioning`` rules that keep those axes
sharded and run the kernel on shard-local blocks.  The kernels need no
cross-device communication, so the rule is pure bookkeeping: honor
whatever sharding the batch dims arrive with, force the matrix dims
replicated.

The wrapped impls are the *dispatching* bodies (Mosaic kernels on TPU,
the XLA reference math elsewhere), so the partitioning rule itself is
exercised by the CPU-mesh test suite (tests/test_partition.py) and by
the 8-virtual-device dryrun even though Mosaic only runs on real TPU.

Resolution happens at trace time like every other backend choice in
``ops.dispatch``: enabled when more than one device is visible
(``jax.device_count() > 1``), so a single-chip program is byte-identical
to the unwrapped one.  Override with VARGP_TPU_PARTITION_KERNELS=1/0.

No reference counterpart: the reference is single-process, single-device
(SURVEY §2.3; experiments/vargp.py:84 device selection).
"""

import functools
import os
import string

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

_VALID_ENV = ("auto", "0", "1", "off", "on", "false", "true")


def partition_enabled() -> bool:
    """Trace-time switch for the partitioned kernel wrappers."""
    env = os.environ.get("VARGP_TPU_PARTITION_KERNELS", "auto")
    if env not in _VALID_ENV:  # fail loudly on typos (see ADVICE r2)
        raise ValueError(
            f"VARGP_TPU_PARTITION_KERNELS={env!r}; expected one of {_VALID_ENV}"
        )
    if env in ("0", "off", "false"):
        return False
    if env in ("1", "on", "true"):
        return True
    try:
        return jax.device_count() > 1
    except Exception:  # backend unavailable (e.g. dead TPU tunnel probe)
        return False


def _dim_entry(sharding, dim):
    """PartitionSpec entry of ``sharding`` at ``dim`` (None if open)."""
    spec = tuple(getattr(sharding, "spec", ()) or ())
    return spec[dim] if dim < len(spec) else None


# ---------------------------------------------------------------------------
# Fused-scaling symmetric Gram: z (O, M, D), invs (H, D), gamma2 (H,)
#   -> (H, O, M, M).  Shardable factors: o (class axis), h (hyper axis).
# ---------------------------------------------------------------------------


@functools.cache
def _sym_gram_part():
    from vargp_tpu.ops.pallas.rbf_gram import _sym_gram_impl

    f = custom_partitioning(_sym_gram_impl, static_argnums=(3,))

    def part(precision, mesh, arg_shapes, result_shape):
        z_s, inv_s, g2_s = (a.sharding for a in arg_shapes)
        o_ax = _dim_entry(z_s, 0)
        h_ax = _dim_entry(inv_s, 0) or _dim_entry(g2_s, 0)
        if h_ax == o_ax:  # can't reuse one mesh axis for both output dims
            h_ax = None
        arg_sh = (
            NamedSharding(mesh, P(o_ax, None, None)),
            NamedSharding(mesh, P(h_ax, None)),
            NamedSharding(mesh, P(h_ax)),
        )
        res_sh = NamedSharding(mesh, P(h_ax, o_ax, None, None))

        def lower(z, invs, gamma2):
            return _sym_gram_impl(z, invs, gamma2, precision)

        return mesh, lower, res_sh, arg_sh

    # m/n/d are compute dims the kernel needs whole; only h/o shard.
    f.def_partition(partition=part, sharding_rule="o m d, h d, h -> h o m n")
    return f


def sym_gram_partitioned(z, invs, gamma2, precision):
    return _sym_gram_part()(z, invs, gamma2, precision)


# ---------------------------------------------------------------------------
# Generic RBF Gram (the DKL Kzz path): sx (B..., M, D), sy (B..., N, D),
# g2 (B...,) -> (B..., M, N), batch-parallel over every leading dim.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _rbf_gram_part(nbatch: int):
    from vargp_tpu.ops.pallas.rbf_gram import _rbf_gram_impl

    assert 1 <= nbatch <= 8, nbatch  # callers always pass real batch dims
    f = custom_partitioning(_rbf_gram_impl, static_argnums=(3,))
    bs = " ".join(string.ascii_lowercase[:nbatch])
    rule = f"{bs} u w, {bs} v w, {bs} -> {bs} u v"

    def part(precision, mesh, arg_shapes, result_shape):
        sx_s = arg_shapes[0].sharding
        batch = [_dim_entry(sx_s, d) for d in range(nbatch)]
        arg_sh = (
            NamedSharding(mesh, P(*batch, None, None)),
            NamedSharding(mesh, P(*batch, None, None)),
            NamedSharding(mesh, P(*batch)),
        )
        res_sh = NamedSharding(mesh, P(*batch, None, None))

        def lower(sx, sy, g2):
            return _rbf_gram_impl(sx, sy, g2, precision)

        return mesh, lower, res_sh, arg_sh

    f.def_partition(partition=part, sharding_rule=rule)
    return f


def rbf_gram_partitioned(sx, sy, g2, precision):
    return _rbf_gram_part(g2.ndim)(sx, sy, g2, precision)


# ---------------------------------------------------------------------------
# Fused cross Gram (predictive Kzx): z (O, M, D), x (B, D), invs2 (H, D),
# gamma2 (H,) -> (H, O, M, B).  Shardable factors: h (hyper), o (class),
# b (data batch) — under the ("data", "model") mesh o rides "model" and
# b rides "data", so the kernel runs on shard-local blocks with zero
# communication.
# ---------------------------------------------------------------------------


@functools.cache
def _cross_gram_part():
    from vargp_tpu.ops.pallas.rbf_gram import _cross_gram_impl

    f = custom_partitioning(_cross_gram_impl, static_argnums=(4,))

    def part(precision, mesh, arg_shapes, result_shape):
        z_s, x_s, inv_s, g2_s = (a.sharding for a in arg_shapes)
        o_ax = _dim_entry(z_s, 0)
        b_ax = _dim_entry(x_s, 0)
        h_ax = _dim_entry(inv_s, 0) or _dim_entry(g2_s, 0)
        # one mesh axis cannot shard two output dims
        if b_ax is not None and b_ax == o_ax:
            b_ax = None
        if h_ax is not None and h_ax in (o_ax, b_ax):
            h_ax = None
        arg_sh = (
            NamedSharding(mesh, P(o_ax, None, None)),
            NamedSharding(mesh, P(b_ax, None)),
            NamedSharding(mesh, P(h_ax, None)),
            NamedSharding(mesh, P(h_ax)),
        )
        res_sh = NamedSharding(mesh, P(h_ax, o_ax, None, b_ax))

        def lower(z, x, invs2, gamma2):
            return _cross_gram_impl(z, x, invs2, gamma2, precision)

        return mesh, lower, res_sh, arg_sh

    f.def_partition(
        partition=part, sharding_rule="o m d, b d, h d, h -> h o m b"
    )
    return f


def cross_gram_partitioned(z, x, invs2, gamma2, precision):
    return _cross_gram_part()(z, x, invs2, gamma2, precision)


# ---------------------------------------------------------------------------
# Diagonal-block Cholesky: K (..., S, S) -> L (..., S, S), batch-parallel
# over every leading dim.  Rank-generic via a per-ndim wrapper cache.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _diag_chol_part(ndim: int):
    from vargp_tpu.gpmath.linalg import _diag_chol_impl

    f = custom_partitioning(_diag_chol_impl)
    letters = string.ascii_lowercase[: ndim - 2]
    bs = " ".join(letters)
    rule = f"{bs} y z -> {bs} y z".strip()

    def part(mesh, arg_shapes, result_shape):
        ks = arg_shapes[0].sharding
        batch = [_dim_entry(ks, d) for d in range(ndim - 2)]
        sh = NamedSharding(mesh, P(*batch, None, None))
        return mesh, _diag_chol_impl, sh, (sh,)

    f.def_partition(partition=part, sharding_rule=rule)
    return f


def diag_chol_partitioned(K):
    return _diag_chol_part(K.ndim)(K)
