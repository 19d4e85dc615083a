import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time, jax, jax.numpy as jnp, numpy as np
from vargp_tpu.ops.pallas.chol_panel import diag_chol_pallas
from vargp_tpu.utils.profiling import device_trace

rng = np.random.default_rng(0)
G = 30
A = rng.standard_normal((G, 128, 128)).astype(np.float32)
K = jnp.asarray(A @ A.transpose(0, 2, 1) / 128 + 2.0 * np.eye(128, dtype=np.float32))
t0 = time.time()
L = diag_chol_pallas(K, unrolled=True); L.block_until_ready()
print("v5 compile+run:", round(time.time()-t0, 1), "s", flush=True)
print("err:", float(jnp.max(jnp.abs(L - jnp.linalg.cholesky(K)))), flush=True)
fn = jax.jit(lambda K: diag_chol_pallas(K, unrolled=True))
with device_trace() as tr:
    for _ in range(50):
        out = fn(K)
    out.block_until_ready()
print("v5 pallas diag chol (30,128,128):", round(sum(tr["events"].values())/50, 4), "ms", flush=True)
