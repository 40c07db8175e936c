import time, json
import jax, jax.numpy as jnp
from outdoor_nerf_depth_tpu.models import ngp as ngp_lib
from outdoor_nerf_depth_tpu.ops import occupancy as occ_lib
from tests.test_models import _unit_sphere_rays  # reuse ray fixture

model = ngp_lib.HashGridModel(scale=0.5, max_samples=64, n_candidates=256,
                              compute_dtype=jnp.bfloat16)
rays = _unit_sphere_rays(n=8192, seed=0)
variables = model.init(jax.random.PRNGKey(0), rng=None, rays=rays)
grid = occ_lib.init_grid(model.scale, model.grid_resolution)

def timeit(tag, f, n=5):
    o = f(); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    t0 = time.perf_counter()
    for _ in range(n): o = f()
    jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    print(json.dumps({tag: round((time.perf_counter()-t0)/n*1e3, 2)}), flush=True)

fwd_none = jax.jit(lambda v, r: model.apply(v, None, r)[0][0]["rgb"])
fwd_grid = jax.jit(lambda v, r, g: model.apply(v, None, r, occupancy=g)[0][0]["rgb"])
bwd = jax.jit(jax.grad(lambda v, r: model.apply(v, None, r)[0][0]["rgb"].sum()))

# Sampler-only: candidates + lookup + compaction.
def sampler_only(r, g):
    e_max = float(occ_lib.cascade_extents(0.5)[-1])
    t_near, t_far, hit = occ_lib.intersect_aabb(r.origins, r.viewdirs, e_max)
    t_far = jnp.maximum(jnp.minimum(t_far, r.far[..., 0]), t_near + 1e-4)
    edges = occ_lib.march_candidates(None, t_near, t_far, 256, True)
    mids = 0.5 * (edges[..., :-1] + edges[..., 1:])
    pts = r.origins[..., None, :] + mids[..., None] * r.viewdirs[..., None, :]
    occd = occ_lib.lookup(g, pts, 0.5, 0.01) & hit[..., None]
    return occ_lib.compact_occupied(edges, occd, 64)[0]
sampler = jax.jit(sampler_only)

timeit("fwd_dense_ms", lambda: fwd_none(variables, rays))
timeit("fwd_grid_ms", lambda: fwd_grid(variables, rays, grid))
timeit("bwd_dense_ms", lambda: bwd(variables, rays))
timeit("sampler_ms", lambda: sampler(rays, grid))
