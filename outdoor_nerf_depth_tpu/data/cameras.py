"""Camera models, pixel->ray casting with cone radii, pose normalization.

Capability parity with the reference camera layer
(`/root/reference/nerf-methods/mipnerf360/internal/camera_utils.py`): pinhole
and fisheye projection, iterative radial/tangential undistortion, mip-NeRF
ray differentials, pose recentering and PCA normalization (the source of the
scene `scale` that multiplies every depth map), and render-path generation.

Works in numpy on the host pipeline and jnp inside jit (pass `xnp`), matching
the reference's deferred `cast_rays_in_train_step` fast path.
"""

from __future__ import annotations

from typing import Mapping, Optional

import numpy as np

from outdoor_nerf_depth_tpu.data import rays as rays_lib

_OPENCV_TO_OPENGL3 = np.diag([1.0, -1.0, -1.0])


def intrinsics_matrix(fx, fy, cx, cy, xnp=np):
    """[3,3] pinhole intrinsics in OpenCV pixel convention."""
    return xnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])


def pinhole_pixtocam(focal, width, height, xnp=np):
    """Inverse intrinsics of an ideal centered pinhole."""
    return xnp.linalg.inv(intrinsics_matrix(focal, focal, 0.5 * width, 0.5 * height, xnp))


def pixel_grid(width: int, height: int, xnp=np):
    """Integer (x, y) coordinate grids, shape [height, width] each."""
    return xnp.meshgrid(xnp.arange(width), xnp.arange(height), indexing="xy")


def _undistort(xd, yd, dist: Mapping[str, float], xnp=np, iters: int = 10):
    """Invert the OpenCV radial(k1..k4)/tangential(p1,p2) model by Newton steps."""
    k1 = dist.get("k1", 0.0)
    k2 = dist.get("k2", 0.0)
    k3 = dist.get("k3", 0.0)
    k4 = dist.get("k4", 0.0)
    p1 = dist.get("p1", 0.0)
    p2 = dist.get("p2", 0.0)
    x, y = xd, yd
    for _ in range(iters):
        r = x * x + y * y
        d = 1.0 + r * (k1 + r * (k2 + r * (k3 + r * k4)))
        fx = d * x + 2 * p1 * x * y + p2 * (r + 2 * x * x) - xd
        fy = d * y + 2 * p2 * x * y + p1 * (r + 2 * y * y) - yd
        d_r = k1 + r * (2 * k2 + r * (3 * k3 + r * 4 * k4))
        fx_x = d + 2 * x * x * d_r + 2 * p1 * y + 6 * p2 * x
        fx_y = 2 * x * y * d_r + 2 * p1 * x + 2 * p2 * y
        fy_x = 2 * x * y * d_r + 2 * p2 * y + 2 * p1 * x
        fy_y = d + 2 * y * y * d_r + 2 * p2 * x + 6 * p1 * y
        det = fy_x * fx_y - fx_x * fy_y
        safe = xnp.abs(det) > 1e-9
        x = x + xnp.where(safe, (fx * fy_y - fy * fx_y) / det, 0.0)
        y = y + xnp.where(safe, (fy * fx_x - fx * fy_x) / det, 0.0)
    return x, y


def pixels_to_rays(
    pix_x,
    pix_y,
    pixtocams,
    camtoworlds,
    distortion: Optional[Mapping[str, float]] = None,
    camtype: str = "perspective",
    xnp=np,
):
    """Cast rays through pixel centers, with mip-NeRF cone radii.

    Vectorized over leading dims of pix_x/pix_y; pixtocams [.., 3, 3] and
    camtoworlds [.., 3, 4] broadcast against them. Returns
    (origins, directions, viewdirs, radii, imageplane). The cone radius is
    the half mean offset to the +x/+y neighbor directions scaled by 2/sqrt(12)
    — the variance match to a pixel-wide box (reference
    `camera_utils.py:627-629`).
    """
    # Shoot through pixel centers, plus the two neighbor rays for footprints.
    mk = lambda x, y: xnp.stack([x + 0.5, y + 0.5, xnp.ones_like(x)], axis=-1)
    trio = xnp.stack([mk(pix_x, pix_y), mk(pix_x + 1, pix_y), mk(pix_x, pix_y + 1)])

    if xnp is np:
        mat_vec = lambda A, v: (A @ v[..., None])[..., 0]
    else:
        import jax

        mat_vec = lambda A, v: xnp.matmul(
            A, v[..., None], precision=jax.lax.Precision.HIGHEST
        )[..., 0]

    cam_dirs = mat_vec(pixtocams, trio)

    if distortion is not None:
        ux, uy = _undistort(cam_dirs[..., 0], cam_dirs[..., 1], distortion, xnp=xnp)
        cam_dirs = xnp.stack([ux, uy, xnp.ones_like(ux)], axis=-1)

    if camtype == "fisheye":
        theta = xnp.minimum(
            xnp.pi, xnp.sqrt(xnp.sum(xnp.square(cam_dirs[..., :2]), axis=-1))
        )
        sinc = xnp.sin(theta) / theta
        cam_dirs = xnp.stack(
            [cam_dirs[..., 0] * sinc, cam_dirs[..., 1] * sinc, xnp.cos(theta)],
            axis=-1,
        )

    cam_dirs = cam_dirs @ xnp.asarray(_OPENCV_TO_OPENGL3)
    imageplane = cam_dirs[0, ..., :2]

    world_dirs = mat_vec(camtoworlds[..., :3, :3], cam_dirs)
    directions, dx, dy = world_dirs[0], world_dirs[1], world_dirs[2]
    origins = xnp.broadcast_to(camtoworlds[..., :3, -1], directions.shape)
    viewdirs = directions / xnp.linalg.norm(directions, axis=-1, keepdims=True)

    dx_norm = xnp.linalg.norm(dx - directions, axis=-1)
    dy_norm = xnp.linalg.norm(dy - directions, axis=-1)
    radii = (0.5 * (dx_norm + dy_norm))[..., None] * (2.0 / xnp.sqrt(12.0))
    return origins, directions, viewdirs, radii, imageplane


def cast_pixels(pixels: rays_lib.Pixels, cameras, camtype="perspective", xnp=np):
    """Pixels -> Rays given stacked per-camera (pixtocams, camtoworlds, dist).

    `cameras` is (pixtocams [N,3,3], camtoworlds [N,3,4], distortion-or-None).
    Runs on numpy in the host loader or on jnp inside the train step.
    """
    pixtocams, camtoworlds, distortion = cameras
    cam_idx = pixels.cam_idx[..., 0]
    gather = lambda arr: arr if arr.ndim == 2 else arr[cam_idx]
    origins, directions, viewdirs, radii, imageplane = pixels_to_rays(
        pixels.pix_x,
        pixels.pix_y,
        gather(pixtocams),
        gather(camtoworlds),
        distortion=distortion,
        camtype=camtype,
        xnp=xnp,
    )
    return rays_lib.Rays(
        origins=origins,
        directions=directions,
        viewdirs=viewdirs,
        radii=radii,
        imageplane=imageplane,
        lossmult=pixels.lossmult,
        near=pixels.near,
        far=pixels.far,
        cam_idx=pixels.cam_idx,
        exposure_idx=pixels.exposure_idx,
        exposure_values=pixels.exposure_values,
    )


# --------------------------------------------------------------------------
# Pose normalization. The `scale` these produce folds into every depth map
# (the #1 correctness trap flagged in SURVEY.md section 7).
# --------------------------------------------------------------------------


def pad_pose(p: np.ndarray) -> np.ndarray:
    bottom = np.broadcast_to([0, 0, 0, 1.0], p[..., :1, :4].shape)
    return np.concatenate([p[..., :3, :4], bottom], axis=-2)


def average_pose(poses: np.ndarray) -> np.ndarray:
    """Mean camera: average position, mean viewing direction, mean up."""
    position = poses[:, :3, 3].mean(0)
    z = _normalize(poses[:, :3, 2].mean(0))
    up = poses[:, :3, 1].mean(0)
    return view_matrix(z, up, position)


def view_matrix(lookdir, up, position) -> np.ndarray:
    """Camera-to-world from forward/up/position (OpenGL convention)."""
    z = _normalize(lookdir)
    x = _normalize(np.cross(up, z))
    y = _normalize(np.cross(z, x))
    return np.stack([x, y, z, position], axis=1)


def _normalize(v):
    return v / np.linalg.norm(v)


def recenter_poses(poses: np.ndarray):
    """Recenter onto the average pose. Returns (new_poses, transform[4,4])."""
    cam2world = average_pose(poses)
    transform = np.linalg.inv(pad_pose(cam2world[None])[0])
    poses = transform @ pad_pose(poses)
    return poses[..., :3, :4], transform


def normalize_poses_pca(poses: np.ndarray):
    """Align principal axes of camera positions with XYZ, fit to unit cube.

    Returns (poses [N,3,4], transform [4,4]). `transform` maps original world
    coordinates to normalized coordinates; its isotropic scale (the per-axis
    norm of the linear block) is the factor by which all metric depths must
    be multiplied to live in the normalized scene — exposed via
    `pose_scale(transform)`. Matches reference `transform_poses_pca`
    (`camera_utils.py:191-227`) including the y-up disambiguation flip.
    """
    t = poses[:, :3, 3]
    t_mean = t.mean(axis=0)
    centered = t - t_mean

    eigval, eigvec = np.linalg.eig(centered.T @ centered)
    order = np.argsort(eigval)[::-1]
    rot = np.real(eigvec[:, order]).T
    if np.linalg.det(rot) < 0:
        rot = np.diag([1.0, 1.0, -1.0]) @ rot

    transform = np.concatenate([rot, rot @ -t_mean[:, None]], -1)
    new_poses = (pad_pose(transform[None])[0] @ pad_pose(poses))[:, :3, :4]
    transform = np.concatenate([transform, np.eye(4)[3:]], axis=0)

    # Disambiguate the sign so the mean camera-up has +z.
    if new_poses.mean(axis=0)[2, 1] < 0:
        flip = np.diag([1.0, -1.0, -1.0])
        new_poses = flip @ new_poses
        transform = np.diag([1.0, -1.0, -1.0, 1.0]) @ transform

    scale = 1.0 / np.max(np.abs(new_poses[:, :3, 3]))
    new_poses[:, :3, 3] *= scale
    transform = np.diag([scale] * 3 + [1.0]) @ transform
    return new_poses, transform


def pose_scale(transform: np.ndarray) -> float:
    """Isotropic scale of a normalization transform (metric -> scene units)."""
    return float(np.sqrt((transform[:3, :3] @ transform[:3, :3].T)[0, 0]))


def average_pose(poses: np.ndarray, points: Optional[np.ndarray] = None):
    """The mean camera frame used by the NGP-style normalization.

    Matches the reference's `average_poses`
    (`ngp-depth/datasets/ray_utils.py:108-147`): center = point-cloud (or
    camera) centroid; z = normalized mean camera z; x = normalize(mean-y x
    z); y = z x x. Returns a [3, 4] camera-to-world frame.
    """
    use_pts = points is not None and len(points)
    center = points.mean(0) if use_pts else poses[:, :3, 3].mean(0)
    z = poses[:, :3, 2].mean(0)
    z = z / np.linalg.norm(z)
    y_ = poses[:, :3, 1].mean(0)
    x = np.cross(y_, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z, center], axis=1)


def normalize_poses_min_norm(poses: np.ndarray, points: Optional[np.ndarray] = None):
    """NGP-style online normalization: align to the average camera frame,
    then divide translations by the min camera norm.

    Matches the reference ColmapDataset convention exactly
    (`ngp-depth/datasets/colmap.py:104-121` via `ray_utils.center_poses`):
    every pose is premultiplied by the INVERSE of the average camera frame
    (rotation + translation, not just a centroid shift), then scaled so the
    nearest camera sits at unit distance. Returns (poses, scale) — depths
    divide by `scale` (`depth_pose_scale`).
    """
    avg = np.eye(4)
    avg[:3] = average_pose(poses, points)
    avg_inv = np.linalg.inv(avg)
    bottom = np.broadcast_to(
        np.array([0.0, 0.0, 0.0, 1.0]), (len(poses), 1, 4)
    )
    homo = np.concatenate([poses[:, :3, :4], bottom], axis=1)
    out = (avg_inv @ homo)[:, :3]
    scale = float(np.linalg.norm(out[:, :3, 3], axis=-1).min())
    out = out.copy()
    out[:, :3, 3] /= scale
    return out, scale


def rays_to_ndc(origins, directions, pixtocam, near: float = 1.0, xnp=np):
    """Map world-space rays into normalized device coordinates.

    The forward-facing (LLFF-style) parametrization of NeRF Appendix C,
    capability parity with `mipnerf360/internal/camera_utils.py:32-97`:
    assumes a pinhole camera at the identity pose looking down -z. Origins
    are slid to the near plane (new near bound 0), then the t=0 and t=inf
    points are perspective-projected; `directions_ndc` spans exactly
    [near plane, infinity] -> NDC z in [-1, 1], so sampling s in [0, 1]
    of `origins_ndc + s * directions_ndc` covers the whole frustum.
    Directions are NOT unit length by construction.
    """
    t_near = -(near + origins[..., 2]) / directions[..., 2]
    origins = origins + t_near[..., None] * directions

    ox, oy, oz = (origins[..., i] for i in range(3))
    dx, dy, dz = (directions[..., i] for i in range(3))
    # 1/cx' and 1/cy' of the NDC viewport: pixtocam[0, 2] = -cx/f.
    xmult = 1.0 / pixtocam[0, 2]
    ymult = 1.0 / pixtocam[1, 2]

    origins_ndc = xnp.stack(
        [xmult * ox / oz, ymult * oy / oz, -xnp.ones_like(oz)], axis=-1
    )
    infinity_ndc = xnp.stack(
        [xmult * dx / dz, ymult * dy / dz, xnp.ones_like(oz)], axis=-1
    )
    return origins_ndc, infinity_ndc - origins_ndc


def generate_ellipse_path(
    poses: np.ndarray,
    n_frames: int = 120,
    z_variation: float = 0.0,
    z_phase: float = 0.0,
) -> np.ndarray:
    """Inward-facing elliptical render path through the camera ring."""
    center = focus_point(poses) * np.array([1.0, 1.0, 0.0])
    offset = np.array([center[0], center[1], 0.0])
    sc = np.percentile(np.abs(poses[:, :3, 3] - offset), 90, axis=0)
    zlo, zhi = np.percentile(poses[:, :3, 3], [10, 90], axis=0)

    theta = np.linspace(0, 2 * np.pi, n_frames, endpoint=False)
    positions = np.stack(
        [
            sc[0] * np.cos(theta) + offset[0],
            sc[1] * np.sin(theta) + offset[1],
            z_variation
            * (zlo[2] + (zhi - zlo)[2] * (np.cos(theta + 2 * np.pi * z_phase) * 0.5 + 0.5)),
        ],
        axis=-1,
    )
    avg_up = _normalize(poses[:, :3, 1].sum(0))
    return np.stack([view_matrix(p - center, avg_up, p) for p in positions])


def focus_point(poses: np.ndarray) -> np.ndarray:
    """Least-squares closest point to all camera optical axes."""
    directions, origins = poses[:, :3, 2:3], poses[:, :3, 3:4]
    m = np.eye(3) - directions * np.transpose(directions, [0, 2, 1])
    mt_m = np.transpose(m, [0, 2, 1]) @ m
    return np.squeeze(-np.linalg.inv(mt_m.mean(0)) @ (mt_m @ -origins).mean(0))


def fundamental_matrix(K1, w2c1, K2, w2c2) -> np.ndarray:
    """F such that x2^T F x1 = 0 for correspondences (pixels, homogeneous).

    The math behind the reference's epipolar inspector
    (`nerfplusplus/camera_inspector/inspect_epipolar_geometry.py`): relative
    pose cam1->cam2, essential from the translation cross-product, lifted
    to pixels through the inverse intrinsics.
    """
    rel = np.asarray(w2c2) @ np.linalg.inv(np.asarray(w2c1))
    R, t = rel[:3, :3], rel[:3, 3]
    tx = np.array(
        [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]]
    )
    E = tx @ R
    return np.linalg.inv(np.asarray(K2)).T @ E @ np.linalg.inv(np.asarray(K1))


def epipolar_line(pixel_xy, F) -> np.ndarray:
    """Line coefficients (a, b, c) in image 2 for a pixel in image 1
    (ax + by + c = 0), normalized so (a, b) is unit."""
    x = np.array([pixel_xy[0], pixel_xy[1], 1.0])
    l = np.asarray(F) @ x
    n = np.linalg.norm(l[:2])
    return l / (n + 1e-12)


def generate_spiral_path(
    poses: np.ndarray,
    bounds,
    n_frames: int = 120,
    n_rots: int = 2,
    zrate: float = 0.5,
) -> np.ndarray:
    """Forward-facing spiral render path (LLFF-style).

    Reference `mipnerf360/internal/camera_utils.py:159-188`: focus depth is
    a disparity-space blend of stretched near/far bounds; spiral radii are
    the 90th percentile of camera positions; all cameras look at the focus
    point along the average pose's -z.
    """
    bounds = np.asarray(bounds, np.float64).reshape(-1)
    near_bound = bounds.min() * 0.9
    far_bound = bounds.max() * 5.0
    focal = 1.0 / ((1 - 0.75) / near_bound + 0.75 / far_bound)

    radii = np.percentile(np.abs(poses[:, :3, 3]), 90, axis=0)
    radii = np.concatenate([radii, [1.0]])

    cam2world = pad_pose(average_pose(poses)[None])[0]
    up = poses[:, :3, 1].mean(0)
    render_poses = []
    for theta in np.linspace(0, 2 * np.pi * n_rots, n_frames, endpoint=False):
        t = radii * np.array(
            [np.cos(theta), -np.sin(theta), -np.sin(theta * zrate), 1.0]
        )
        position = (cam2world @ t)[:3]
        lookat = (cam2world @ np.array([0.0, 0, -focal, 1.0]))[:3]
        render_poses.append(view_matrix(position - lookat, up, position))
    return np.stack(render_poses)


def generate_spline_path(
    poses: np.ndarray,
    n_interp: int = 10,
    spline_degree: int = 5,
    smoothness: float = 0.03,
    rot_weight: float = 0.1,
) -> np.ndarray:
    """Smooth B-spline through keyframe poses.

    Poses are lifted to (position, lookat-point, up-point) triplets so
    rotation interpolates as geometry (reference
    `camera_utils.py:281-329`); returns `n_interp * (n-1)` poses.
    """
    import scipy.interpolate

    pos = poses[:, :3, 3]
    lookat = pos - rot_weight * poses[:, :3, 2]
    up_pt = pos + rot_weight * poses[:, :3, 1]
    points = np.stack([pos, lookat, up_pt], axis=1)  # [n, 3, 3]

    n = n_interp * (points.shape[0] - 1)
    flat = points.reshape(points.shape[0], -1)
    k = min(spline_degree, flat.shape[0] - 1)
    tck, _ = scipy.interpolate.splprep(flat.T, k=k, s=smoothness)
    u = np.linspace(0, 1, n, endpoint=False)
    new = np.array(scipy.interpolate.splev(u, tck)).T.reshape(n, 3, 3)
    return np.stack(
        [view_matrix(p - l, u_ - p, p) for p, l, u_ in new]
    )
