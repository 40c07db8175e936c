import time, jax, jax.numpy as jnp, numpy as np
from outdoor_nerf_depth_tpu import parallel
from outdoor_nerf_depth_tpu.data import datasets as datasets_lib
from outdoor_nerf_depth_tpu.train import step as step_lib
from outdoor_nerf_depth_tpu.train.config import Config
config = Config(model="nerfpp",
    model_params=dict(cascade_samples=(64,128), net_depth=8, net_width=256,
                      pos_degrees=10, view_degrees=4, compute_dtype="bfloat16"),
    compute_dtype="bfloat16", batch_size=1024, lambda_depth=0.1,
    depth_loss_type="mse", depth_loss_reduce="mean_valid",
    interlevel_loss_mult=0.0, distortion_loss_mult=0.0,
    data_coarse_loss_mult=1.0, lr_delay_steps=0)
dataset = datasets_lib.SyntheticDataset("train", global_batch_size=1024, n_images=8, height=94, width=310, seed=0)
mesh = parallel.make_mesh()
for k in (16, 32):
    model, state = step_lib.init_state(config, jax.random.PRNGKey(0))
    state = parallel.put_replicated(state, mesh)
    ms = step_lib.make_multi_train_step(config, model, mesh, cameras=dataset.cameras, camtype=dataset.camtype)
    stacked = parallel.shard_batch_stack([dataset.sample_batch() for _ in range(k)], mesh)
    fracs = jnp.full((k,), 0.5, jnp.float32)
    rng = jax.random.PRNGKey(1)
    def rngs_for(d):
        return jnp.stack([jax.random.fold_in(rng, d*k+i) for i in range(k)])
    state, stats = ms(state, stacked, rngs_for(0), fracs); jax.block_until_ready(stats["loss"])
    state, stats = ms(state, stacked, rngs_for(1), fracs); jax.block_until_ready(stats["loss"])
    t0=time.time()
    for d in range(4):
        state, stats = ms(state, stacked, rngs_for(2+d), fracs)
    jax.block_until_ready(stats["loss"])
    dt=time.time()-t0
    print(f"K={k}: {1024*k*4/dt:.0f} rays/s ({dt/4/k*1000:.1f} ms/step)", flush=True)
