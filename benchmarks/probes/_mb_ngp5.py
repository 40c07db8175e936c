import time, json
import jax, jax.numpy as jnp
from outdoor_nerf_depth_tpu.models import ngp as ngp_lib
from outdoor_nerf_depth_tpu.ops import occupancy as occ_lib
from tests.test_models import _unit_sphere_rays

model = ngp_lib.HashGridModel(scale=0.5, max_samples=64, n_candidates=256,
                              compute_dtype=jnp.bfloat16)
rays = _unit_sphere_rays(n=8192, seed=0)
variables = model.init(jax.random.PRNGKey(0), rng=None, rays=rays)
grid = occ_lib.init_grid(model.scale, model.grid_resolution)

def perturb(r, s):
    return r.replace(origins=r.origins + 1e-6 * s)

def timeit(tag, f, n=5):
    s = jnp.float32(0.0)
    s = f(s); jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(n):
        s = f(s)
    jax.block_until_ready(s)
    print(json.dumps({tag: round((time.perf_counter()-t0)/n*1e3, 2)}), flush=True)

@jax.jit
def fwd_dense(v, r, s):
    out = model.apply(v, None, perturb(r, s))[0][0]["rgb"]
    return out.mean()

@jax.jit
def fwd_grid(v, r, g, s):
    out = model.apply(v, None, perturb(r, s), occupancy=g)[0][0]["rgb"]
    return out.mean()

grad_fn = jax.jit(jax.grad(
    lambda v, r, s: model.apply(v, None, perturb(r, s))[0][0]["rgb"].sum().astype(jnp.float32)))

@jax.jit
def bwd_dense(v, r, s):
    g = grad_fn(v, r, s)
    return sum(jnp.sum(x).astype(jnp.float32) for x in jax.tree_util.tree_leaves(g))

@jax.jit
def sampler(r, g, s):
    r = perturb(r, s)
    e_max = float(occ_lib.cascade_extents(0.5)[-1])
    t_near, t_far, hit = occ_lib.intersect_aabb(r.origins, r.viewdirs, e_max)
    t_far = jnp.maximum(jnp.minimum(t_far, r.far[..., 0]), t_near + 1e-4)
    edges = occ_lib.march_candidates(None, t_near, t_far, 256, True)
    mids = 0.5 * (edges[..., :-1] + edges[..., 1:])
    pts = r.origins[..., None, :] + mids[..., None] * r.viewdirs[..., None, :]
    occd = occ_lib.lookup(g, pts, 0.5, 0.01) & hit[..., None]
    return occ_lib.compact_occupied(edges, occd, 64)[0].mean()

timeit("sampler_ms", lambda s: sampler(rays, grid, s))
timeit("fwd_dense_ms", lambda s: fwd_dense(variables, rays, s))
timeit("fwd_grid_ms", lambda s: fwd_grid(variables, rays, grid, s))
timeit("bwd_dense_ms", lambda s: bwd_dense(variables, rays, s))
