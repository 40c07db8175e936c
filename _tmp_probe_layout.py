"""Probe: actual HBM bytes of candidate table/intermediate shapes, and
gather rates from a wide-row [L*T, 8] phys table. Run on the real TPU."""
import outdoor_nerf_depth_tpu as _ondt
_ondt.apply_platform_env()
_ondt.enable_compilation_cache()
import time
import jax, jax.numpy as jnp

dev = jax.devices()[0]
print("backend:", jax.default_backend(), dev)

def used():
    s = dev.memory_stats()
    return 0 if s is None else s.get("bytes_in_use", 0)

base = 0
def report(name, arr):
    arr.block_until_ready()
    print(f"{name}: shape={arr.shape} logical={arr.size*4/2**20:.0f}MiB "
          f"hbm_delta={(used()-base)/2**20:.0f}MiB")

# 1) canonical table shape (exists in prod)
t1 = jnp.zeros((16, 2**19, 2), jnp.float32)
report("canon [16,T,2]", t1)
# 2) wide phys 2-D
t2 = jnp.zeros((16 * 2**19, 8), jnp.float32)
report("phys2d [L*T,8]", t2)
# 3) 3-D narrow trailing
t3 = jnp.zeros((16 * 2**19, 4, 2), jnp.float32)
report("phys3d [L*T,4,2]", t3)
del t3
# 4) big 2-D reduction intermediate
t4 = jnp.zeros((25_000_000, 8), jnp.float32)
report("vals [25M,8]", t4)
del t4

# gather rate from wide 2-D phys
import numpy as np
rng = jax.random.PRNGKey(0)
idx = jax.random.randint(rng, (16_777_216,), 0, 16 * 2**19)
idx = jax.device_put(idx).block_until_ready()

@jax.jit
def g2(tbl, idx):
    return jnp.sum(jnp.take(tbl, idx, axis=0), dtype=jnp.float32)

for name, tbl in (("phys2d[L*T,8]", t2), ("canon-flat[L*T,2]", t1.reshape(-1, 2))):
    out = g2(tbl, idx); float(out)  # compile+warm
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        float(g2(tbl, idx))
    dt = (time.perf_counter() - t0) / n
    print(f"gather {name}: {dt*1e3:.1f} ms for 16.7M rows -> {dt/16.7e6*1e9:.2f} ns/row")
