import jax, jax.numpy as jnp
def body(i, x):
    return x @ x * jnp.float32(1e-9) + x
f = jax.jit(lambda x: jax.lax.fori_loop(0, 60000, body, x))
x = jnp.full((8192, 8192), 1.0001, jnp.float32)
y = f(x)
print(float(y[0, 0]))
