import json, re
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

# Reach the inner jitted function: ts is a closure `call` over `jitted`.
jitted = ts.__closure__[0].cell_contents if ts.__closure__ else None
names = {}
if jitted is None or not hasattr(jitted, "lower"):
    for cell in ts.__closure__ or ():
        v = cell.cell_contents
        if hasattr(v, "lower"):
            jitted = v
            break
lowered = jitted.lower(state, b, jax.random.PRNGKey(1), 0.5, grid)
compiled = lowered.compile()
ca = compiled.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
print(json.dumps({k: v for k, v in ca.items()
                  if k in ("flops", "bytes accessed", "transcendentals",
                           "optimal_seconds")}), flush=True)
hlo = compiled.as_text()
# Top-level op histogram with big shapes.
counts = {}
for line in hlo.splitlines():
    m = re.search(r"= (\w+)\(", line)
    if not m:
        continue
    op = m.group(1)
    counts[op] = counts.get(op, 0) + 1
print(json.dumps(dict(sorted(counts.items(), key=lambda kv: -kv[1])[:25])),
      flush=True)
for pat in ("sort", "while", "scatter", "gather"):
    lines = [l.strip()[:160] for l in hlo.splitlines() if f"= {pat}" in l or f" {pat}(" in l]
    print(f"== {pat}: {len(lines)}", flush=True)
    for l in lines[:6]:
        print("   ", l, flush=True)
