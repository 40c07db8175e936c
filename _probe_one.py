import sys, time, jax
from outdoor_nerf_depth_tpu import parallel
from outdoor_nerf_depth_tpu.data import datasets as datasets_lib
from outdoor_nerf_depth_tpu.train import step as step_lib
from outdoor_nerf_depth_tpu.train.config import Config

tag = sys.argv[1]
base = dict(model="nerfpp",
    model_params=dict(cascade_samples=(64,128), net_depth=8, net_width=256,
                      pos_degrees=10, view_degrees=4, compute_dtype="bfloat16"),
    compute_dtype="bfloat16", batch_size=1024, lambda_depth=0.1,
    depth_loss_type="mse", depth_loss_reduce="mean_valid",
    interlevel_loss_mult=0.0, distortion_loss_mult=0.0,
    data_coarse_loss_mult=1.0, lr_delay_steps=0)
batch = 1024
if tag == "f32":
    base["compute_dtype"] = "float32"
    base["model_params"]["compute_dtype"] = "float32"
elif tag == "batch8192":
    base["batch_size"] = batch = 8192
elif tag == "batch16384":
    base["batch_size"] = batch = 16384
elif tag == "no-depth":
    base["lambda_depth"] = 0.0
elif tag == "coarse-only":
    base["model_params"]["cascade_samples"] = (64,)

config = Config(**base)
ds = datasets_lib.SyntheticDataset("train", global_batch_size=batch, n_images=8, height=94, width=310, seed=0)
mesh = parallel.make_mesh()
model, state = step_lib.init_state(config, jax.random.PRNGKey(0))
ts = step_lib.make_train_step(config, model, mesh, cameras=ds.cameras, camtype=ds.camtype)
b = parallel.shard_batch(ds.sample_batch(), mesh)
rng = jax.random.PRNGKey(1)
for i in range(3):
    state, stats = ts(state, b, jax.random.fold_in(rng, i), 0.5)
jax.block_until_ready(stats["loss"])
t0 = time.perf_counter()
steps = 15
for i in range(steps):
    state, stats = ts(state, b, jax.random.fold_in(rng, 100+i), 0.5)
jax.block_until_ready(stats["loss"])
dt = (time.perf_counter()-t0)/steps
print(f"{tag}: {dt*1e3:.2f} ms/step -> {batch/dt:.0f} rays/s", flush=True)
