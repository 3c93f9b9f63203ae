"""Pinhole + rectified-stereo camera model.

Replaces the reference's raw P-matrix plumbing (calib parsing at
/root/reference/visual_odometry_solution_methods.py:9-18 and projection
scattered through Point3D.py / BundleAdjustment.py:317-329) with one
typed camera struct used by every stage.

The stereo rig is assumed rectified (KITTI odometry): identical K for
both cameras, right camera displaced by `baseline` along +x of the left.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from slam1_tpu.ops import se3


class StereoCamera(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    baseline: jnp.ndarray  # metres, positive

    @staticmethod
    def create(fx, fy, cx, cy, baseline, dtype=jnp.float32):
        return StereoCamera(*[jnp.asarray(v, dtype) for v in
                              (fx, fy, cx, cy, baseline)])

    @staticmethod
    def kitti_default(dtype=jnp.float32):
        """KITTI odometry seq 00 grayscale rig parameters."""
        return StereoCamera.create(718.856, 718.856, 607.1928, 185.2157,
                                   0.5371657, dtype)

    @staticmethod
    def for_canvas(height: int, width: int, dtype=jnp.float32):
        """KITTI-like rig rescaled to an arbitrary canvas (same FOV and
        baseline, principal point at the canvas centre) — used by tests
        and synthetic benches on small images."""
        fx = 718.856 * (width / 1226.0)
        return StereoCamera.create(fx, fx, width / 2.0, height / 2.0,
                                   0.5371657, dtype)

    @property
    def K(self):
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack([
            jnp.stack([self.fx, z, self.cx]),
            jnp.stack([z, self.fy, self.cy]),
            jnp.stack([z, z, o]),
        ])

    def projection_matrices(self):
        """(P_left, P_right) 3x4 for the rectified pair."""
        K = self.K
        P_l = jnp.concatenate([K, jnp.zeros((3, 1), K.dtype)], axis=1)
        t = jnp.array([-self.baseline, 0.0, 0.0], K.dtype)
        P_r = jnp.concatenate([K, (K @ t)[:, None]], axis=1)
        return P_l, P_r


def project(cam: StereoCamera, X_cam, eps=1e-6):
    """Camera-frame points (...,3) -> pixel coords (...,2) + in-front mask."""
    z = X_cam[..., 2]
    valid = z > eps
    zs = jnp.where(valid, z, 1.0)
    u = cam.fx * X_cam[..., 0] / zs + cam.cx
    v = cam.fy * X_cam[..., 1] / zs + cam.cy
    return jnp.stack([u, v], axis=-1), valid


def project_stereo(cam: StereoCamera, X_cam, eps=1e-6):
    """-> (uv_left, uv_right, valid)."""
    uv_l, valid = project(cam, X_cam, eps)
    X_r = X_cam - jnp.array([1.0, 0.0, 0.0], X_cam.dtype) * cam.baseline
    uv_r, valid_r = project(cam, X_r, eps)
    return uv_l, uv_r, valid & valid_r


def project_world(cam: StereoCamera, T_wc, X_world, eps=1e-6):
    """World points through world-from-camera pose T_wc -> left pixels."""
    X_cam = se3.transform_points(se3.inverse(T_wc), X_world)
    return project(cam, X_cam, eps)


def backproject(cam: StereoCamera, uv, depth):
    """Pixels (...,2) + depth (...) -> camera-frame points (...,3)."""
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)
