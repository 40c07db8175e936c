import time, json, sys
import jax, jax.numpy as jnp
from outdoor_nerf_depth_tpu.ops import hashgrid

N = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
L, T, F = 16, 2**19, 2
res = hashgrid.level_resolutions(L, 16, 2048)
key = jax.random.PRNGKey(0)
table = jax.random.normal(key, (L, T, F), jnp.float32) * 1e-2
x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))

enc = jax.jit(lambda t, x: hashgrid.encode(x, t, res, T))
loss = jax.jit(jax.grad(lambda t, x: hashgrid.encode(x, t, res, T).sum()))

def timeit(f, *a, n=10):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n * 1e3

print(json.dumps({"n": N, "fwd_ms": round(timeit(enc, table, x), 2),
                  "bwd_ms": round(timeit(loss, table, x), 2)}), flush=True)
