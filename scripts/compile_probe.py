"""Which sub-computation of the eval predictor owns the 615 s compile?

Compiles ONE piece of the analysis-shape predict program per invocation
(so a slow server-side compile never looks like a hang) and times
trace vs compile.  Optionally probes whether the JAX persistent
compilation cache works on the axon tunnel backend (run the same piece
twice with --cache: the second process should hit the cache).

Usage: python scripts/compile_probe.py PIECE [--cache DIR]
  PIECE in: small | chol | build | predict_train | predict_eval |
            predict_nf10 | predict_h3 | softmax | marginal
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

piece = sys.argv[1]
cache = None
if "--cache" in sys.argv:
    cache = sys.argv[sys.argv.index("--cache") + 1]

import jax
import jax.numpy as jnp

if cache:
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from dataclasses import replace

from vargp_tpu import gpmath
from vargp_tpu.models import vargp as V

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
    compiled = lowered.compile()
    t_c = time.perf_counter() - t0
    print(f"{name}: trace {t_tr:.1f}s compile {t_c:.1f}s", flush=True)
    return compiled


if piece == "small":
    # cheap >1 s-compile program to test cache plumbing end-to-end
    def f(a):
        for _ in range(24):
            a = jnp.tanh(a @ a)
        return a

    clock("small", f, jnp.eye(256))
elif piece == "chol":
    from vargp_tpu.ops.dispatch import chol_and_inv

    K = jnp.eye(n_tasks * M) * 2.0
    K = jnp.broadcast_to(K, (20, 10, n_tasks * M, n_tasks * M))
    clock("chol_and_inv(20,10,100,100)", chol_and_inv, K)
elif piece == "build":
    clock(
        "build_posterior(eval)",
        lambda p, pr, m, k: V.build_posterior(p, pr, k, cfg_eval, chain_mask=m),
        params, prev, mask, key,
    )
elif piece == "predict_train":
    clock(
        "predict(train-budget)",
        lambda p, pr, m, x, k: V.predict(
            p, pr, x, k, cfg, n_f=cfg.n_f, n_var_samples=cfg.n_var_samples,
            chain_mask=m,
        ),
        params, prev, mask, xb, key,
    )
elif piece == "predict_eval":
    clock(
        "predict(eval: n_f=50, H=20)",
        lambda p, pr, m, x, k: V.predict(p, pr, x, k, cfg_eval, chain_mask=m),
        params, prev, mask, xb, key,
    )
elif piece == "predict_nf10":
    # eval H=20 but train n_f: isolates the n_f axis
    clock(
        "predict(n_f=10, H=20)",
        lambda p, pr, m, x, k: V.predict(
            p, pr, x, k, cfg_eval, n_f=10, chain_mask=m
        ),
        params, prev, mask, xb, key,
    )
elif piece == "predict_h3":
    # eval n_f=50 but train H: isolates the n_var_samples axis
    clock(
        "predict(n_f=50, H=3)",
        lambda p, pr, m, x, k: V.predict(
            p, pr, x, k, cfg_eval, n_var_samples=3, chain_mask=m
        ),
        params, prev, mask, xb, key,
    )
elif piece == "softmax":
    from vargp_tpu.likelihoods.softmax import softmax_predict

    fm = jnp.zeros((20, 10, 512))
    fv = jnp.ones((20, 10, 512))
    clock("softmax_predict(n_f=50)", lambda k, m, v: softmax_predict(k, m, v, 50),
          key, fm, fv)
elif piece == "marginal":
    cp = jax.eval_shape(
        lambda p, pr, k: V.build_posterior(p, pr, k, cfg_eval, chain_mask=mask),
        params, prev, key,
    )
    cp_real = jax.jit(
        lambda p, pr, k: V.build_posterior(p, pr, k, cfg_eval, chain_mask=mask)
    )(params, prev, key)
    clock(
        "marginal_diag(eval)",
        lambda c, p, x: V.marginal_diag(c, p, x, cfg_eval, chain_mask=mask),
        cp_real, params, xb,
    )
else:
    raise SystemExit(f"unknown piece {piece}")
