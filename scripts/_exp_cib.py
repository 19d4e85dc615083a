import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from vargp_tpu.gpmath.linalg import chol_and_inv_blocked, tri_inv
from vargp_tpu.utils.profiling import device_trace

rng = np.random.default_rng(0)
G, S = 30, 300
A = rng.standard_normal((G, S, S)).astype(np.float32)
K = jnp.asarray(A @ A.transpose(0, 2, 1) / S + 2.0 * np.eye(S, dtype=np.float32))

def mono(K):
    L = jnp.linalg.cholesky(K)
    return L, tri_inv(L)

fns = {
    "monolithic chol + NS tri_inv": jax.jit(mono),
    "task-blocked 60": jax.jit(lambda K: chol_and_inv_blocked(K, 60)),
    "blocked 100": jax.jit(lambda K: chol_and_inv_blocked(K, 100)),
    "blocked 150": jax.jit(lambda K: chol_and_inv_blocked(K, 150)),
}
Lr, Lir = fns["monolithic chol + NS tri_inv"](K)
for label, f in fns.items():
    L, Li = f(K)
    err = float(jnp.max(jnp.abs(L - Lr)))
    jax.block_until_ready((L, Li))
    with device_trace() as tr:
        for _ in range(30): out = f(K)
        jax.block_until_ready(out)
    print(f"{label:30s} {sum(tr['events'].values())/30:.4f} ms  (L err {err:.1e})", flush=True)
