import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), "platform:", jax.devices()[0].platform)
from outdoor_nerf_depth_tpu.ops import pallas_volren
tau = jnp.asarray(np.random.RandomState(0).rand(1024, 192) * 2.0, jnp.float32)
f = jax.jit(lambda t: pallas_volren.weights_from_tau(t, False))
w = f(tau)
want = pallas_volren.weights_from_tau_reference(tau)
print("fwd max err:", float(jnp.max(jnp.abs(w - want))))
g = jax.jit(jax.grad(lambda t: jnp.sum(jnp.sin(pallas_volren.weights_from_tau(t, False)))))(tau)
g_ref = jax.grad(lambda t: jnp.sum(jnp.sin(pallas_volren.weights_from_tau_reference(t))))(tau)
print("bwd max err:", float(jnp.max(jnp.abs(g - g_ref))))
import time
for _ in range(2): jax.block_until_ready(f(tau))
t0=time.perf_counter()
for _ in range(50): w=f(tau)
jax.block_until_ready(w); print("fwd ms:", (time.perf_counter()-t0)/50*1e3)
