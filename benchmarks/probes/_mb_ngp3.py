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
grid = occ_lib.init_grid(model.scale, model.grid_resolution)
b = parallel.shard_batch(ds.sample_batch(), mesh)
rng = jax.random.PRNGKey(1)

t_last = time.perf_counter()
for i in range(12):
    state, stats = ts(state, b, rng, 0.5, grid)
    jax.block_until_ready(stats["loss"])
    now = time.perf_counter()
    print(json.dumps({"i": i, "ms": round((now - t_last) * 1e3, 1)}), flush=True)
    t_last = now
