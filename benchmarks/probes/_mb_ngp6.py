import time, json
import jax, jax.numpy as jnp
import optax

# Param pytree sized like the NGP field (hash table dominates: 16.8M f32).
params = {"table": jnp.zeros((16, 2**19, 2), jnp.float32),
          "w": jnp.zeros((64, 64), jnp.float32)}
tx = optax.adam(1e-3)
opt_state = tx.init(params)

@jax.jit
def loss_fn(p, s):
    return jnp.sum(p["table"][0, :128] ** 2) + jnp.sum(p["w"] ** 2) + s

@jax.jit
def step(p, o, s):
    g = jax.grad(loss_fn)(p, s)
    u, o = tx.update(g, o)
    p = optax.apply_updates(p, u)
    return p, o, loss_fn(p, s)

step_donated = jax.jit(step, donate_argnums=(0, 1))

for tag, fn in (("plain", step), ("donated", step_donated)):
    p = {"table": jnp.zeros((16, 2**19, 2), jnp.float32),
         "w": jnp.zeros((64, 64), jnp.float32)}
    o = tx.init(p)
    s = jnp.float32(0.0)
    p, o, s = fn(p, o, s)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(5):
        p, o, s = fn(p, o, s)
    jax.block_until_ready(s)
    print(json.dumps({tag + "_ms": round((time.perf_counter()-t0)/5*1e3, 2)}),
          flush=True)
