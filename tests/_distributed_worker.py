"""Worker process for the multi-process distributed test.

Launched (2x) by tests/test_parallel.py::test_multiprocess_distributed_step.
Each worker joins a jax.distributed cluster over localhost, contributes 4
virtual CPU devices to a global 8-device ("data", "model") mesh, runs ONE
sharded ELBO update on the tiny problem, and prints a JSON digest the
parent compares against its own single-process run.

Must be launched with XLA_FLAGS=--xla_force_host_platform_device_count=4
and with any TPU-plugin env stripped (the parent does both).
"""

import json
import sys


def main():
    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")

    from vargp_tpu.parallel.distributed import global_mesh, initialize

    # BEFORE any device use (jax.distributed contract)
    initialize(coordinator_address=coordinator, num_processes=num_procs, process_id=pid)
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.local_devices()) == 4, jax.local_devices()

    mesh = global_mesh()
    assert mesh.devices.size == 4 * num_procs, mesh

    from tests.test_parallel import tiny_problem
    from vargp_tpu import parallel
    from vargp_tpu.train.loop import TrainHyperparams, make_optimizer

    params, prev, prior, cfg, x, y, w = tiny_problem()
    hp = TrainHyperparams(lr=1e-2)
    key = jax.random.key(42)

    tx = make_optimizer(hp)
    # device_put with a global sharding + identical host values on every
    # process: the supported multi-process placement recipe
    p = parallel.shard_params(params, mesh, cfg.out_size)
    prev_s = parallel.shard_params(prev, mesh, cfg.out_size)
    o = parallel.shard_params(tx.init(p), mesh, cfg.out_size)
    xs, ys, ws = parallel.shard_batch(x, y, w, mesh)
    update = parallel.make_sharded_update_fn(cfg, tx, beta=1.0, n_train=100, mesh=mesh)
    p, o, loss, aux = update(p, o, prev_s, prior, xs, ys, ws, key)

    import jax.numpy as jnp

    @jax.jit
    def digest(tree):
        return jnp.sqrt(
            sum(jnp.vdot(l, l) for l in jax.tree_util.tree_leaves(tree))
        )

    out = dict(
        process_count=jax.process_count(),
        n_devices=int(mesh.devices.size),
        loss=float(loss),
        klh=float(aux[0]),
        klu=float(aux[1]),
        nll=float(aux[2]),
        pnorm=float(digest(p)),
    )
    print("DIGEST " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
