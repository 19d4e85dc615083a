import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from vargp_tpu import gpmath
from vargp_tpu.ops.dispatch import chol_and_inv
from vargp_tpu.utils.profiling import device_trace

rng = np.random.default_rng(0)
H, O, T, M = 3, 10, 5, 60
S = T * M
A = rng.standard_normal((H, O, S, S)).astype(np.float32)
K = jnp.asarray(A @ A.transpose(0, 1, 3, 2) / S + 2.0 * np.eye(S, dtype=np.float32))
u_means = [jnp.asarray(rng.standard_normal((O, M, 1)).astype(np.float32)) for _ in range(T)]
u_trils = [jnp.asarray(np.tril(rng.standard_normal((O, M, M))).astype(np.float32) + 2*np.eye(M, dtype=np.float32)) for _ in range(T)]

def fold(K):
    L, Li = chol_and_inv(K)
    p = gpmath.ar_joint_posterior(L, u_means, u_trils, L_inv=Li)
    return p.mean, p.LS

def fast(K):
    L, Li = chol_and_inv(K)
    p = gpmath.ar_joint_posterior_fast(L, Li, u_means, u_trils)
    return p.mean, p.LS

f1, f2 = jax.jit(fold), jax.jit(fast)
m1, s1 = f1(K); m2, s2 = f2(K)
print("mean diff:", float(jnp.max(jnp.abs(m1 - m2))), "LS diff:", float(jnp.max(jnp.abs(s1 - s2))), flush=True)
for label, f in (("fold (unrolled joins)", f1), ("fast (block-LDL)", f2)):
    jax.block_until_ready(f(K))
    with device_trace() as tr:
        for _ in range(30): out = f(K)
        jax.block_until_ready(out)
    print(f"{label:24s} {sum(tr['events'].values())/30:.4f} ms (incl chol_and_inv)", flush=True)
