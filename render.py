"""CLI: render a smooth camera path from a trained checkpoint.

  python render.py --config exp/scene/config.json [n_frames=120] \
      [path=ellipse|spiral|spline|train] [render_height=.. render_width=..]

Replaces the reference's `mipnerf360/render.py` video driver: generates an
inward-facing elliptical, forward-facing spiral, or keyframe-spline path
(or reuses training poses), renders each frame's color + depth, writes PNGs
to `exp_dir/path_renders/`, and stitches an mp4 when imageio+ffmpeg are
available.
"""

import outdoor_nerf_depth_tpu as _ondt

_ondt.apply_platform_env()
_ondt.enable_compilation_cache()

import os
import sys


def main(argv):
    import numpy as np

    from outdoor_nerf_depth_tpu import parallel
    from outdoor_nerf_depth_tpu.data import cameras as cameras_lib
    from outdoor_nerf_depth_tpu.data import rays as rays_lib
    from outdoor_nerf_depth_tpu.train import step as step_lib
    from outdoor_nerf_depth_tpu.train.config import load_config
    from outdoor_nerf_depth_tpu.train.loop import build_dataset
    from outdoor_nerf_depth_tpu.utils import image as image_lib
    from outdoor_nerf_depth_tpu.utils import vis as vis_lib

    path_kind, n_frames = "ellipse", 60
    render_h = render_w = None
    cfg_path, overrides = None, []
    it = iter(argv)
    for a in it:
        if a == "--config":
            cfg_path = next(it)
        elif a.startswith("path="):
            path_kind = a.split("=", 1)[1]
        elif a.startswith("n_frames="):
            n_frames = int(a.split("=", 1)[1])
        elif a.startswith("render_height="):
            render_h = int(a.split("=", 1)[1])
        elif a.startswith("render_width="):
            render_w = int(a.split("=", 1)[1])
        else:
            overrides.append(a)
    config = load_config(cfg_path, overrides)

    dataset = build_dataset(config, "train")
    # Optional output resolution override: rescale the inverse intrinsics
    # so the field of view is preserved at the new pixel grid.
    height, width = dataset.height, dataset.width
    pixtocams = np.asarray(dataset.pixtocams)
    if render_h or render_w:
        render_h = render_h or int(round(height * render_w / width))
        render_w = render_w or int(round(width * render_h / height))
        scale = np.diag([width / render_w, height / render_h, 1.0]).astype(
            np.float32
        )
        pixtocams = pixtocams @ scale
        height, width = render_h, render_w
    if hasattr(dataset, "scene_scale"):
        config = config.replace(depth_scale=float(dataset.scene_scale))
    mesh = parallel.make_mesh()
    model, state, occupancy, step = step_lib.load_checkpoint(config)
    print(f"restored step {step}")
    render_chunk = step_lib.make_render_fn(config, model, mesh)

    if path_kind == "ellipse":
        poses = cameras_lib.generate_ellipse_path(
            dataset.camtoworlds, n_frames=n_frames
        )
    elif path_kind == "spiral":
        poses = cameras_lib.generate_spiral_path(
            dataset.camtoworlds, (dataset.near, dataset.far), n_frames=n_frames
        )
    elif path_kind == "spline":
        keys = dataset.camtoworlds[:: max(1, len(dataset.camtoworlds) // 8)]
        poses = cameras_lib.generate_spline_path(
            keys, n_interp=max(1, n_frames // max(1, len(keys) - 1))
        )
    elif path_kind == "train":
        poses = dataset.camtoworlds[:n_frames]
    else:
        raise ValueError(f"unknown path {path_kind!r}")

    out_dir = os.path.join(config.exp_dir, "path_renders")
    os.makedirs(out_dir, exist_ok=True)
    frames = []
    for fi, pose in enumerate(poses):
        px, py = cameras_lib.pixel_grid(width, height)
        pixels = rays_lib.Pixels(
            pix_x=px.astype(np.float32),
            pix_y=py.astype(np.float32),
            cam_idx=np.zeros(px.shape + (1,), np.int32),
            lossmult=np.ones(px.shape + (1,), np.float32),
            near=np.full(px.shape + (1,), dataset.near, np.float32),
            far=np.full(px.shape + (1,), dataset.far, np.float32),
        )
        rays = cameras_lib.cast_pixels(
            pixels,
            (pixtocams, pose[None].astype(np.float32), None),
            dataset.camtype,
        )
        batch = rays_lib.Batch(rays=rays)
        rendering = step_lib.render_image(
            render_chunk, state.params, batch, mesh, config.render_chunk_size,
            aux=occupancy,
        )
        rgb = np.asarray(rendering["rgb"])
        depth = np.asarray(rendering["distance_mean"]) / config.depth_scale
        frame = vis_lib.side_by_side(rgb, vis_lib.visualize_depth(depth))
        image_lib.save_img_u8(frame, os.path.join(out_dir, f"frame_{fi:04d}.png"))
        frames.append((np.clip(frame, 0, 1) * 255).astype(np.uint8))
        print(f"frame {fi + 1}/{len(poses)}")

    try:
        import imageio.v2 as imageio

        imageio.mimwrite(
            os.path.join(out_dir, "path.mp4"), frames, fps=15, quality=8
        )
        print(f"wrote {out_dir}/path.mp4")
    except Exception as e:  # ffmpeg may be absent; frames remain on disk
        print(f"video stitching skipped ({e}); frames in {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])
