import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from vargp_tpu.kernels import cross_gram

rng = np.random.default_rng(0)
theta = jnp.asarray(rng.standard_normal((3, 785)).astype(np.float32) * 0.1)
z = jnp.asarray(rng.standard_normal((10, 1000, 784)).astype(np.float32))
x = jnp.asarray(rng.standard_normal((512, 784)).astype(np.float32))

def loss(theta, z):
    return jnp.sum(cross_gram(theta, z, x))

v, g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))(theta, z)
print("cross_gram S=1000 value+grad ok:", float(v), flush=True)
