"""Which sub-computation of the eval predictor owns the 615 s compile?

Compiles pieces of the analysis-shape predict program separately and
times each .compile().  Also probes whether the JAX persistent
compilation cache works on the axon tunnel backend (run twice: second
run should hit the cache).

Usage: python scripts/compile_probe.py [cache_dir]
"""

import sys, os, time; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from dataclasses import replace

if len(sys.argv) > 1:
    jax.config.update("jax_compilation_cache_dir", sys.argv[1])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from vargp_tpu.models import vargp as V
from vargp_tpu import gpmath

n_tasks, M, in_size = 5, 20, 64
cfg = V.VARGPConfig(M=M, out_size=10, in_size=in_size)
cfg_eval = replace(cfg, n_f=50, n_var_samples=20)
key = jax.random.key(0)
z = jax.random.normal(key, (cfg.out_size, cfg.M, cfg.in_size))
params, prior = V.init_params(key, z, cfg)
prev, mask = V.pad_chain((V.freeze_task(params),), cfg, t_max=n_tasks)
xb = jnp.zeros((512, in_size))


def clock(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t_tr = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    print(f"{name}: trace {t_tr:.1f}s compile {time.perf_counter()-t0:.1f}s", flush=True)


# 1. full predict at eval budgets (the 615 s program)
clock("predict(eval)", lambda p, pr, m, x, k: V.predict(p, pr, x, k, cfg_eval, chain_mask=m),
      params, prev, mask, xb, key)

# 2. build_posterior alone (chol_and_inv + factored AR)
clock("build_posterior(eval)",
      lambda p, pr, m, k: V.build_posterior(p, pr, k, cfg_eval, chain_mask=m),
      params, prev, mask, key)

# 3. chol_and_inv alone at the eval Gram shape (H=20, O=10, SM=100)
from vargp_tpu.ops.dispatch import chol_and_inv
K = jnp.eye(n_tasks * M) * 2.0
K = jnp.broadcast_to(K, (20, 10, n_tasks * M, n_tasks * M))
clock("chol_and_inv(20,10,100,100)", chol_and_inv, K)

# 4. predict at TRAIN budgets (H=3, n_f=10) — same program family the
# drivers compile; isolates budget-axis vs structure
clock("predict(train-budget)",
      lambda p, pr, m, x, k: V.predict(p, pr, x, k, cfg, chain_mask=m),
      params, prev, mask, xb, key)
