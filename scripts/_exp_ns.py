import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from vargp_tpu.utils.profiling import device_trace
H = jax.lax.Precision.HIGHEST
HI = jax.lax.Precision.HIGH

def ns(L, prec_mid, prec_last):
    n = L.shape[-1]
    steps = max(1, (n - 1).bit_length())
    eye = jnp.eye(n, dtype=L.dtype)
    inv_d = 1.0 / jnp.diagonal(L, axis1=-2, axis2=-1)
    X = eye * inv_d[..., :, None]
    two = 2.0 * eye
    for s in range(steps):
        p = prec_last if s == steps - 1 else prec_mid
        LX = jnp.einsum("...ij,...jk->...ik", L, X, precision=p)
        X = jnp.einsum("...ij,...jk->...ik", X, two - LX, precision=p)
    return X

rng = np.random.default_rng(0)
A = rng.standard_normal((90, 128, 128)).astype(np.float32)
K = jnp.asarray(A @ A.transpose(0,2,1)/128 + 1e-4*np.eye(128, dtype=np.float32) + np.eye(128, dtype=np.float32)*0.5)
L = jnp.linalg.cholesky(K)
for label, pm, pl_ in (("all HIGHEST", H, H), ("mid HIGH last HIGHEST", HI, H), ("all HIGH", HI, HI)):
    f = jax.jit(lambda L, pm=pm, pl_=pl_: ns(L, pm, pl_))
    X = f(L); X.block_until_ready()
    R = jnp.einsum("...ij,...jk->...ik", L, X, precision=H) - jnp.eye(128)
    with device_trace() as tr:
        for _ in range(50): out = f(L)
        out.block_until_ready()
    print(f"{label:24s} residual {float(jnp.max(jnp.abs(R))):.2e}  {sum(tr['events'].values())/50:.4f} ms", flush=True)
