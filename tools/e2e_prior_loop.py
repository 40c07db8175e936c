"""End-to-end prior->NeRF chain on the KITTI fixture (VERDICT r4 #5).

Demonstrates the reference's central capability chain (SURVEY.md §3.6;
reference `README.md:97-118`) with NO emulation at any stage:

  1. build a depth-completion training set from the fixture (sparse LiDAR
     emulated by sparsifying the fixture's metric depth — the *input*
     sparsity, not the prior itself);
  2. train `GuidedCompletionNet` on it (`train_prior.py complete`);
  3. run `depth_priors.generate.generate_completion_priors` to write REAL
     uint16 prior PNGs into the scene as `depths_mffgen_crop/`;
  4. train the NeRF with `depth_sup_type=mffgen_crop` vs `rgbonly` at
     sparse views and compare depth RMSE on the held-out split.

    python tools/e2e_prior_loop.py [out=E2E_PRIOR_r05.json]
        [fixture=/tmp/kitti_fixture_full] [work=/tmp/e2e_prior]
        [prior_steps=400] [nerf_steps=3000] [sample_every=4]
        [backend=mip] [cpu=0] [stages=all]

`stages=prior` stops after PNG generation (CPU-friendly); `stages=nerf`
assumes the PNGs exist and runs only the two NeRF legs (chip-friendly).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import outdoor_nerf_depth_tpu as _ondt

_ondt.apply_platform_env()
_ondt.enable_compilation_cache()

import json
import shutil
import subprocess
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NERF_CONFIGS = {
    "mip": os.path.join(REPO, "configs", "kitti_mipnerf360.json"),
    "ngp": os.path.join(REPO, "configs", "kitti_ngp.json"),
}
PRIOR_NAME = "mffgen_crop"  # folder: depths_mffgen_crop


def ensure_fixture(path: str):
    if os.path.isdir(os.path.join(path, "dtu_format", "sparse")):
        return
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_kitti_fixture.py"),
         path, "30"],
        capture_output=True, text=True, cwd=REPO,
    )
    if r.returncode != 0:
        raise RuntimeError(f"fixture generation failed: {r.stdout}{r.stderr}")


def build_completion_data(scene: str, work: str, density: float = 0.05,
                          seed: int = 3):
    """KITTI-completion-layout training set from the fixture scene.

    `sparse/` is a random ~`density` subsample of the metric depth (the
    LiDAR-return pattern a completion net sees as INPUT); `groundtruth/`
    is the dense metric depth it regresses to — the same in/out contract
    as the KITTI depth-completion benchmark the reference's nets train on.
    """
    from outdoor_nerf_depth_tpu.data.datasets import load_image
    from outdoor_nerf_depth_tpu.utils.image import save_depth_u16

    root = os.path.join(work, "completion_data")
    for sub in ("image", "sparse", "groundtruth"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(scene, "images")
    for name in sorted(os.listdir(img_dir)):
        shutil.copyfile(os.path.join(img_dir, name),
                        os.path.join(root, "image", name))
        depth = load_image(os.path.join(scene, "depths_gt", name)) / 256.0
        keep = rng.uniform(size=depth.shape) < density
        save_depth_u16(np.where(keep, depth, 0.0),
                       os.path.join(root, "sparse", name))
        save_depth_u16(depth, os.path.join(root, "groundtruth", name))
    return root


def train_completion(data_root: str, work: str, steps: int, cpu: bool):
    import train_prior

    params_path = os.path.join(work, "completion_params.msgpack")
    args = [
        "complete", "--data", data_root, "--arch", "guided",
        "--steps", str(steps), "--batch", "2", "--crop", "64", "192",
        "--out", params_path, "--print-every", str(max(steps // 8, 1)),
    ]
    if cpu:
        args.append("--cpu")
    train_prior.main(args)
    return params_path


def generate_priors(scene: str, params_path: str, work: str):
    import flax.serialization
    import jax

    from outdoor_nerf_depth_tpu.depth_priors import completion, generate

    model = completion.GuidedCompletionNet()
    # Template init at the padded fixture shape, then overwrite from disk.
    rng = np.random.default_rng(0)
    template = model.init(
        jax.random.PRNGKey(0),
        rng.uniform(size=(1, 96, 320, 3)).astype(np.float32),
        rng.uniform(size=(1, 96, 320)).astype(np.float32),
    )
    with open(params_path, "rb") as f:
        params = flax.serialization.from_bytes(template, f.read())

    out_dir = os.path.join(scene, f"depths_{PRIOR_NAME}")
    generate.generate_completion_priors(
        params,
        image_dir=os.path.join(scene, "images"),
        sparse_depth_dir=os.path.join(work, "completion_data", "sparse"),
        out_dir=out_dir,
        arch="guided",
    )
    return out_dir


def prior_quality(scene: str):
    """Depth-RMSE of the generated PNGs vs gt (sanity gate on stage 3)."""
    from outdoor_nerf_depth_tpu.data.datasets import load_image

    errs = []
    gt_dir = os.path.join(scene, "depths_gt")
    pr_dir = os.path.join(scene, f"depths_{PRIOR_NAME}")
    for name in sorted(os.listdir(gt_dir)):
        gt = load_image(os.path.join(gt_dir, name)) / 256.0
        pr = load_image(os.path.join(pr_dir, name)) / 256.0
        m = (gt > 0) & (pr > 0)
        errs.append(float(np.sqrt(np.mean((gt[m] - pr[m]) ** 2))))
    return {"prior_rmse_m": round(float(np.mean(errs)), 4),
            "prior_density": round(
                float(np.mean([
                    (load_image(os.path.join(pr_dir, n)) > 0).mean()
                    for n in sorted(os.listdir(pr_dir))
                ])), 4)}


def run_nerf(scene: str, work: str, backend: str, sup_type: str, steps: int,
             sample_every: int):
    from outdoor_nerf_depth_tpu.train.config import load_config
    from outdoor_nerf_depth_tpu.train.loop import evaluate, train

    # The rgbonly baseline must still LOAD gt depth (for eval metrics):
    # depth_sup_type=rgbonly makes the loader skip depth entirely and the
    # depth-RMSE comparison column vanishes (same pitfall documented in
    # tools/fixture_ablation.py) — so train it as lambda_depth=0 with
    # depth_sup_type=gt.
    sup_overrides = (
        ["depth_sup_type=gt", "lambda_depth=0.0"]
        if sup_type == "rgbonly"
        else [f"depth_sup_type={sup_type}"]
    )
    config = load_config(
        NERF_CONFIGS[backend],
        [
            f"scene_dir={scene}",
            f"exp_dir={os.path.join(work, f'{backend}_{sup_type}')}",
            f"max_steps={steps}",
            *sup_overrides,
            f"sample_every={sample_every}",
            "print_every=500",
            "train_render_every=0",
            "checkpoint_every=100000",  # no mid-run ckpts for short legs
            "compute_ssim=true",
        ],
    )
    t0 = time.perf_counter()
    state, history, occupancy = train(config)
    train_s = time.perf_counter() - t0
    mean, _ = evaluate(config, state, occupancy=occupancy, save_renders=False)
    return {
        "depth_sup_type": sup_type,
        "steps": steps,
        "metrics": {k: round(float(v), 4) for k, v in mean.items()},
        "train_seconds": round(train_s, 1),
    }


def main(argv):
    kv = dict(a.split("=", 1) for a in argv)
    out = kv.get("out", "E2E_PRIOR_r05.json")
    fixture = kv.get("fixture", "/tmp/kitti_fixture_full")
    work = kv.get("work", "/tmp/e2e_prior")
    prior_steps = int(kv.get("prior_steps", 400))
    nerf_steps = int(kv.get("nerf_steps", 3000))
    sample_every = int(kv.get("sample_every", 4))
    backend = kv.get("backend", "mip")
    cpu = kv.get("cpu", "0") == "1"
    stages = kv.get("stages", "all")

    if cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    ensure_fixture(fixture)
    scene = os.path.join(fixture, "dtu_format")
    os.makedirs(work, exist_ok=True)
    results = {}
    if os.path.isfile(out):
        with open(out) as f:
            results = json.load(f)

    if stages in ("all", "prior"):
        data_root = build_completion_data(scene, work)
        t0 = time.perf_counter()
        params_path = train_completion(data_root, work, prior_steps, cpu)
        results["prior_train_seconds"] = round(time.perf_counter() - t0, 1)
        generate_priors(scene, params_path, work)
        results.update(prior_quality(scene))
        results["prior_steps"] = prior_steps
        with open(out, "w") as f:
            json.dump(results, f, indent=2)
        print(json.dumps({k: results[k] for k in
                          ("prior_rmse_m", "prior_density")}), flush=True)

    if stages in ("all", "nerf"):
        if not os.path.isdir(os.path.join(scene, f"depths_{PRIOR_NAME}")):
            raise FileNotFoundError(
                f"run stages=prior first: no depths_{PRIOR_NAME} in {scene}"
            )
        cached = {r["depth_sup_type"]: r
                  for r in results.get("nerf_runs", [])
                  if r.get("metrics", {}).get("rmse") is not None
                  and r.get("steps") == nerf_steps}
        runs = []
        for sup in (PRIOR_NAME, "rgbonly"):
            if sup in cached:
                print(f"=== nerf leg: {sup}: cached ===", flush=True)
                runs.append(cached[sup])
                continue
            print(f"=== nerf leg: {sup} ===", flush=True)
            runs.append(run_nerf(scene, work, backend, sup, nerf_steps,
                                 sample_every))
            results["nerf_runs"] = runs
            with open(out, "w") as f:
                json.dump(results, f, indent=2)
        rmse = {r["depth_sup_type"]: r["metrics"].get("rmse") for r in runs}
        results["prior_beats_rgbonly_rmse"] = bool(
            rmse.get(PRIOR_NAME, 1e9) < rmse.get("rgbonly", -1e9)
        )
        results["backend"] = backend
        results["sample_every"] = sample_every
        with open(out, "w") as f:
            json.dump(results, f, indent=2)
        print(json.dumps({"rmse": rmse,
                          "prior_beats_rgbonly_rmse":
                          results["prior_beats_rgbonly_rmse"]}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
