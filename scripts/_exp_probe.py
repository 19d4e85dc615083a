import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from vargp_tpu.ops.dispatch import chol_and_inv

rng = np.random.default_rng(0)
A = rng.standard_normal((30, 1000, 1000)).astype(np.float32)
K = jnp.asarray(A @ A.transpose(0, 2, 1) / 1000 + 2.0 * np.eye(1000, dtype=np.float32))
L, Li = jax.jit(chol_and_inv)(K)
print("chol_and_inv S=1000 ok:", float(jnp.max(jnp.abs(L))), flush=True)
R = jnp.einsum("...ij,...jk->...ik", L, Li, precision=jax.lax.Precision.HIGHEST)
print("L @ L_inv residual:", float(jnp.max(jnp.abs(R - jnp.eye(1000)))), flush=True)
