import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from outdoor_nerf_depth_tpu.ops import pallas_volren
mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
tau = jnp.asarray(np.random.RandomState(0).rand(256, 64), jnp.float32)
tau = jax.device_put(tau, NamedSharding(mesh, P("data", None)))
f = jax.jit(lambda t: jnp.sum(pallas_volren.weights_from_tau(t, True)))
print("value:", float(f(tau)))
g = jax.jit(jax.grad(lambda t: jnp.sum(pallas_volren.weights_from_tau(t, True)**2)))(tau)
print("grad ok:", bool(jnp.all(jnp.isfinite(g))), "sharding:", g.sharding)
