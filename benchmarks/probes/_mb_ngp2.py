import time, json
import jax
from outdoor_nerf_depth_tpu import parallel
from outdoor_nerf_depth_tpu.data import datasets as datasets_lib
from outdoor_nerf_depth_tpu.ops import occupancy as occ_lib
from outdoor_nerf_depth_tpu.train import step as step_lib
from outdoor_nerf_depth_tpu.train.config import Config

batch = 8192
config = Config(
    model="ngp",
    model_params=dict(scale=0.5, max_samples=64, n_candidates=256,
                      compute_dtype="bfloat16"),
    compute_dtype="bfloat16", batch_size=batch,
    lambda_depth=0.1, depth_loss_type="mse",
    interlevel_loss_mult=0.0, distortion_loss_mult=0.0,
    opacity_loss_mult=1e-3, lr_delay_steps=0,
)
ds = datasets_lib.SyntheticDataset("train", global_batch_size=batch,
                                   n_images=8, height=94, width=310, seed=0)
mesh = parallel.make_mesh()
model, state = step_lib.init_state(config, jax.random.PRNGKey(0))
ts = step_lib.make_train_step(config, model, mesh, cameras=ds.cameras,
                              camtype=ds.camtype)
occ_update = step_lib.make_occupancy_update_fn(config, model, mesh)
grid = occ_lib.init_grid(model.scale, model.grid_resolution)
b = parallel.shard_batch(ds.sample_batch(), mesh)
rng = jax.random.PRNGKey(1)

def timeit(tag, fn, n=10):
    global state, grid
    fn(); fn(); fn()
    jax.block_until_ready(state.params["params"]["field"]["encoder"]["table"])
    t0 = time.perf_counter()
    for _ in range(n): fn()
    jax.block_until_ready(state.params["params"]["field"]["encoder"]["table"])
    print(json.dumps({tag: round((time.perf_counter()-t0)/n*1e3, 2)}), flush=True)

def do_step():
    global state
    state, _ = ts(state, b, rng, 0.5, grid)

def do_occ_sampled():
    global grid
    grid = occ_update(state.params, grid, rng, False)

def do_occ_warmup():
    global grid
    grid = occ_update(state.params, grid, rng, True)

timeit("step_ms", do_step)
timeit("occ_sampled_ms", do_occ_sampled)
timeit("occ_warmup_ms", do_occ_warmup, n=3)
