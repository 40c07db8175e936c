"""Public-dataset NGP benchmark driver.

The TPU-native replacement for the reference's seven per-dataset bash
scripts (`ngp-depth/benchmarking/*.sh`): one registry of (dataset type,
scene list, scale, budget) per public benchmark, a loop that trains +
evaluates each scene with the unified config, and a summary JSON with
per-scene and mean PSNR/SSIM (+LPIPS when real weights are installed).

    python benchmarks/run_public_benchmark.py synthetic_nerf \
        root=/data/Synthetic_NeRF [scenes=Lego,Chair] [out=bench_results.json] \
        [steps=20000] [key=value config overrides...]

Data is not bundled in this image; point `root` at a standard layout of
the corresponding dataset. Budgets mirror the reference scripts: 20
epochs x 1000 steps, batch 16384 (4096 for mipnerf360 scenes), lr 2e-2.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import outdoor_nerf_depth_tpu as _ondt

_ondt.apply_platform_env()
_ondt.enable_compilation_cache()

import json

# Registry mirroring ngp-depth/benchmarking/*.sh: scene lists, loader
# type, NGP world scale, and any per-suite deviations from the defaults.
SUITES = {
    "synthetic_nerf": dict(
        dataset="blender", scale=0.5,
        scenes=["Chair", "Drums", "Ficus", "Hotdog", "Lego", "Materials",
                "Mic", "Ship"],
    ),
    "synthetic_nsvf": dict(
        dataset="nsvf", scale=0.5,
        scenes=["Wineholder", "Steamtrain", "Toad", "Robot", "Bike",
                "Palace", "Spaceship", "Lifestyle"],
    ),
    "blendedmvs": dict(
        dataset="nsvf", scale=0.5,
        scenes=["Jade", "Fountain", "Character", "Statues"],
    ),
    "tat": dict(  # Tanks and Temples (training subset, NSVF layout)
        dataset="nsvf", scale=0.5, factor=2,
        scenes=["Ignatius", "Truck", "Barn", "Caterpillar", "Family"],
    ),
    "nerfpp": dict(  # tat_intermediate_*/tat_training_* NeRF++ layout
        dataset="nerfpp", scale=4.0,
        scenes=["tat_intermediate_M60", "tat_intermediate_Playground",
                "tat_intermediate_Train", "tat_training_Truck"],
    ),
    "mipnerf360": dict(
        dataset="driving", scale=16.0, batch=4096, factor=4,
        scenes=["bicycle", "bonsai", "counter", "garden", "kitchen",
                "room", "stump"],
    ),
    "rtmv": dict(
        dataset="rtmv", scale=0.5,
        scenes=["4_Privet_Drive", "V8"],
    ),
}


def run_scene(suite: dict, root: str, scene: str, steps: int, overrides):
    from outdoor_nerf_depth_tpu.train import config as config_lib
    from outdoor_nerf_depth_tpu.train.config import Config
    from outdoor_nerf_depth_tpu.train.loop import evaluate, train

    config = Config(
        model="ngp",
        model_params=dict(scale=suite["scale"], max_samples=64,
                          n_candidates=256, compute_dtype="bfloat16"),
        compute_dtype="bfloat16",
        dataset=suite["dataset"],
        scene_dir=os.path.join(root, scene),
        factor=suite.get("factor", 0),
        batch_size=suite.get("batch", 16384),
        max_steps=steps,
        steps_per_dispatch=8,
        lr_init=2e-2,
        lr_final=2e-3,
        lr_delay_steps=0,
        grad_max_norm=0.0,
        lambda_depth=0.0,
        depth_sup_type="rgbonly",
        interlevel_loss_mult=0.0,
        distortion_loss_mult=1e-3,
        opacity_loss_mult=1e-3,
        print_every=1000,
        checkpoint_every=steps,
        exp_dir=os.path.join("exp/public_bench", scene),
    )
    for item in overrides:
        key, raw = item.split("=", 1)
        config = config.replace(**{key.lstrip("-"): config_lib._parse_value(raw)})
    state, _, occupancy = train(config)
    mean, _ = evaluate(config, state, occupancy=occupancy)
    return {k: round(float(v), 4) for k, v in mean.items() if v is not None}


def main(argv):
    if not argv or argv[0] not in SUITES:
        raise SystemExit(f"usage: run_public_benchmark.py <{'|'.join(SUITES)}>"
                         " root=<dataset_root> [scenes=a,b] [steps=N] [k=v...]")
    name = argv[0]
    kv = dict(a.split("=", 1) for a in argv[1:] if "=" in a)
    suite = SUITES[name]
    root = kv.pop("root")
    scenes = kv.pop("scenes", ",".join(suite["scenes"])).split(",")
    steps = int(kv.pop("steps", 20_000))
    out = kv.pop("out", f"bench_{name}.json")
    overrides = [f"{k}={v}" for k, v in kv.items()]

    results = {}
    for scene in scenes:
        print(f"=== {name}/{scene} ===", flush=True)
        results[scene] = run_scene(suite, root, scene, steps, overrides)
        print(json.dumps({scene: results[scene]}), flush=True)
    keys = set.intersection(*(set(r) for r in results.values()))
    summary = {
        "suite": name,
        "scenes": results,
        "mean": {k: round(sum(r[k] for r in results.values()) / len(results), 4)
                 for k in sorted(keys)},
    }
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary["mean"]))


if __name__ == "__main__":
    main(sys.argv[1:])
