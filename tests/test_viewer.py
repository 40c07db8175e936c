"""Headless tests for the orbit-camera math of viewer.py."""

import numpy as np

from viewer import OrbitCamera


class TestOrbitCamera:
    def test_position_on_sphere(self):
        cam = OrbitCamera(center=(1.0, 2.0, 3.0), radius=5.0)
        for theta, phi in [(0, 0), (1.0, 0.5), (-2.0, -1.0)]:
            cam.theta, cam.phi = theta, phi
            np.testing.assert_allclose(
                np.linalg.norm(cam.position() - cam.center), 5.0, rtol=1e-9
            )

    def test_pose_looks_at_center(self):
        cam = OrbitCamera(radius=3.0, theta=0.7, phi=0.3)
        pose = cam.pose()
        # OpenGL: viewing direction is -z axis of the pose.
        view = -pose[:3, 2]
        to_center = cam.center - pose[:3, 3]
        to_center /= np.linalg.norm(to_center)
        np.testing.assert_allclose(view, to_center, atol=1e-9)
        # Orthonormal rotation.
        R = pose[:3, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-9)

    def test_zoom_clamps(self):
        cam = OrbitCamera(radius=1.0)
        for _ in range(100):
            cam.zoom(0.01)
        assert cam.radius >= 1e-3

    def test_phi_clamped(self):
        cam = OrbitCamera()
        cam.orbit(0.0, 10.0)
        assert cam.phi <= 1.5

    def test_pan_moves_in_view_plane(self):
        cam = OrbitCamera(radius=2.0, theta=0.5, phi=0.2)
        before_pose = cam.pose()
        view = before_pose[:3, 2]
        before = cam.center.copy()
        cam.pan(0.1, 0.0)
        delta = cam.center - before
        # Pan is orthogonal to the viewing axis.
        np.testing.assert_allclose(np.dot(delta, view), 0.0, atol=1e-9)
        assert np.linalg.norm(delta) > 0


def test_frusta_viewer_cli(tmp_path):
    """`viewer.py --frusta x.json --frusta-out y.png` renders the export
    (the consumer for data.preprocess.export_camera_frusta_json)."""
    import json

    import viewer

    corners = [[0, 0, 0], [-1, -1, 2], [1, -1, 2], [1, 1, 2], [-1, 1, 2]]
    frusta = {"frusta": [{"name": f"im{i}.png",
                          "corners": [[c[0] + i, c[1], c[2]] for c in corners]}
                         for i in range(3)]}
    src = tmp_path / "frusta.json"
    out = tmp_path / "frusta.png"
    src.write_text(json.dumps(frusta))
    viewer.main(["--frusta", str(src), "--frusta-out", str(out)])
    assert out.exists() and out.stat().st_size > 1000
