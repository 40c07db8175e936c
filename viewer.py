"""Interactive orbit-camera viewer over a trained checkpoint.

  python viewer.py --config exp/scene/config.json [height=200 width=300]

Capability parity with the reference's dearpygui GUI
(`/root/reference/nerf-methods/ngp-depth/show_gui.py:19-193`), built on
matplotlib (dearpygui is not in this image): drag to orbit, scroll to zoom,
arrow keys to pan; renders color|depth side by side at interactive
resolution. The `OrbitCamera` math is importable and unit-tested headless.
"""

import outdoor_nerf_depth_tpu as _ondt

_ondt.apply_platform_env()
_ondt.enable_compilation_cache()

import os
import sys

import numpy as np


class OrbitCamera:
    """Spherical orbit camera producing OpenGL camera-to-world poses."""

    def __init__(self, center=(0.0, 0.0, 0.0), radius: float = 2.0,
                 theta: float = 0.0, phi: float = 0.0):
        self.center = np.asarray(center, np.float64)
        self.radius = float(radius)
        self.theta = float(theta)  # azimuth, radians
        self.phi = float(phi)  # elevation, radians

    def orbit(self, d_theta: float, d_phi: float):
        self.theta += d_theta
        self.phi = float(np.clip(self.phi + d_phi, -1.5, 1.5))

    def zoom(self, factor: float):
        self.radius = float(np.clip(self.radius * factor, 1e-3, 1e6))

    def pan(self, dx: float, dy: float):
        pose = self.pose()
        right, up = pose[:3, 0], pose[:3, 1]
        self.center = self.center + self.radius * (dx * right + dy * up)

    def position(self) -> np.ndarray:
        cp, sp = np.cos(self.phi), np.sin(self.phi)
        ct, st = np.cos(self.theta), np.sin(self.theta)
        offset = self.radius * np.array([cp * st, cp * ct, sp])
        return self.center + offset

    def pose(self) -> np.ndarray:
        """[3, 4] OpenGL camera-to-world looking at the center."""
        from outdoor_nerf_depth_tpu.data import cameras as cameras_lib

        pos = self.position()
        look = self.center - pos
        # OpenGL convention: camera looks down -z, so z-axis = -look.
        return cameras_lib.view_matrix(-look, np.array([0.0, 0.0, 1.0]), pos)


def _render(config, dataset, render_chunk, params, mesh, cam, height, width,
            occupancy=None):
    import jax.numpy as jnp

    from outdoor_nerf_depth_tpu.data import cameras as cameras_lib
    from outdoor_nerf_depth_tpu.data import rays as rays_lib
    from outdoor_nerf_depth_tpu.train import step as step_lib
    from outdoor_nerf_depth_tpu.utils import vis as vis_lib

    focal = 1.1 * width
    pixtocam = cameras_lib.pinhole_pixtocam(focal, width, height).astype(
        np.float32
    )
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
        pixels, (pixtocam, cam.pose()[None].astype(np.float32), None),
        dataset.camtype,
    )
    rendering = step_lib.render_image(
        render_chunk, params, rays_lib.Batch(rays=rays), mesh,
        config.render_chunk_size, aux=occupancy,
    )
    rgb = np.asarray(rendering["rgb"])
    depth = np.asarray(rendering["distance_mean"]) / config.depth_scale
    return vis_lib.side_by_side(rgb, vis_lib.visualize_depth(depth))


def show_frusta(frusta_json: str, out_png=None):
    """Camera-pose inspector: render exported frusta (data.preprocess.
    export_camera_frusta_json) interactively, or to a PNG with `out_png`.

    The consumer for the frusta export — the matplotlib stand-in for the
    reference's open3d `camera_visualizer/visualize_cameras.py` (open3d is
    absent from this image).
    """
    from outdoor_nerf_depth_tpu.utils import vis as vis_lib

    if out_png is not None:
        vis_lib.plot_camera_frusta(frusta_json, out_png)
        print(f"wrote {out_png}")
        return
    import json as json_lib

    import matplotlib.pyplot as plt

    with open(frusta_json) as f:
        data = json_lib.load(f)
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    for fr in data["frusta"]:
        c = np.asarray(fr["corners"])
        for i in range(1, 5):
            j = 1 + (i % 4)
            ax.plot(*np.stack([c[0], c[i]]).T, "b-", lw=0.5)
            ax.plot(*np.stack([c[i], c[j]]).T, "r-", lw=0.5)
    ax.set_box_aspect((1, 1, 1))
    plt.show()


def main(argv):
    from outdoor_nerf_depth_tpu import parallel
    from outdoor_nerf_depth_tpu.train import step as step_lib
    from outdoor_nerf_depth_tpu.train.config import load_config
    from outdoor_nerf_depth_tpu.train.loop import build_dataset

    cfg_path, overrides, height, width = None, [], 200, 300
    frusta_json, frusta_png = None, None
    it = iter(argv)
    for a in it:
        if a == "--config":
            cfg_path = next(it)
        elif a == "--frusta":
            frusta_json = next(it)
        elif a == "--frusta-out":
            frusta_png = next(it)
        elif a.startswith("height="):
            height = int(a.split("=")[1])
        elif a.startswith("width="):
            width = int(a.split("=")[1])
        else:
            overrides.append(a)
    if frusta_json is not None:
        show_frusta(frusta_json, frusta_png)
        return
    config = load_config(cfg_path, overrides)

    dataset = build_dataset(config, "train")
    if hasattr(dataset, "scene_scale"):
        config = config.replace(depth_scale=float(dataset.scene_scale))
    mesh = parallel.make_mesh()
    model, state, occupancy, step = step_lib.load_checkpoint(config)
    print(f"restored step {step}")
    render_chunk = step_lib.make_render_fn(config, model, mesh)

    center = dataset.camtoworlds[:, :3, 3].mean(0)
    radius = np.linalg.norm(
        dataset.camtoworlds[:, :3, 3] - center, axis=-1
    ).max() * 1.5
    cam = OrbitCamera(center=center, radius=max(radius, 0.5))

    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 4))
    im = ax.imshow(
        _render(config, dataset, render_chunk, state.params, mesh, cam,
                height, width, occupancy)
    )
    ax.set_axis_off()
    drag = {"xy": None}

    def refresh():
        im.set_data(
            _render(config, dataset, render_chunk, state.params, mesh, cam,
                    height, width, occupancy)
        )
        fig.canvas.draw_idle()

    def on_press(e):
        drag["xy"] = (e.x, e.y)

    def on_release(e):
        if drag["xy"] is not None:
            dx, dy = e.x - drag["xy"][0], e.y - drag["xy"][1]
            cam.orbit(-0.01 * dx, 0.01 * dy)
            drag["xy"] = None
            refresh()

    def on_scroll(e):
        cam.zoom(0.9 if e.button == "up" else 1.1)
        refresh()

    def on_key(e):
        step_size = 0.05
        moves = {"left": (-step_size, 0), "right": (step_size, 0),
                 "up": (0, step_size), "down": (0, -step_size)}
        if e.key in moves:
            cam.pan(*moves[e.key])
            refresh()

    fig.canvas.mpl_connect("button_press_event", on_press)
    fig.canvas.mpl_connect("button_release_event", on_release)
    fig.canvas.mpl_connect("scroll_event", on_scroll)
    fig.canvas.mpl_connect("key_press_event", on_key)
    plt.show()


if __name__ == "__main__":
    main(sys.argv[1:])
