"""Stereo triangulation.

Replaces cv2.triangulatePoints DLT (/root/reference/Point3D.py:14-19,
visual_odometry.py:128-133). Two paths:

  - `stereo_rectified`: closed-form depth-from-disparity for a rectified
    rig — one fused elementwise expression, the production path.
  - `dlt`: batched general two-view DLT via SVD of the row-normalized
    4x4 design matrix (vmap-friendly), for non-rectified geometry and
    as a cross-check oracle.
"""

from __future__ import annotations

import jax.numpy as jnp

from slam1_tpu.ops.camera import StereoCamera


def stereo_rectified(cam: StereoCamera, uv_l, uv_r,
                     min_disparity=0.25, max_depth=1e4):
    """Rectified stereo triangulation.

    Args:
      uv_l, uv_r: (...,2) pixel coords in left/right images.
    Returns:
      (X (...,3) in the left camera frame, valid (...)).
    """
    disparity = uv_l[..., 0] - uv_r[..., 0]
    valid = disparity > min_disparity
    d = jnp.where(valid, disparity, 1.0)
    z = cam.fx * cam.baseline / d
    valid = valid & (z < max_depth) & (z > 0)
    x = (uv_l[..., 0] - cam.cx) / cam.fx * z
    y = (uv_l[..., 1] - cam.cy) / cam.fy * z
    return jnp.stack([x, y, z], axis=-1), valid


def dlt(P1, P2, uv1, uv2):
    """Batched two-view DLT triangulation.

    Args:
      P1, P2: (3,4) projection matrices.
      uv1, uv2: (N,2) pixel observations.
    Returns:
      (N,3) points (dehomogenized).
    """
    def rows(P, uv):
        r1 = uv[..., 0:1] * P[2] - P[0]
        r2 = uv[..., 1:2] * P[2] - P[1]
        return jnp.stack([r1, r2], axis=-2)  # (N,2,4)

    A = jnp.concatenate([rows(P1, uv1), rows(P2, uv2)], axis=-2)  # (N,4,4)
    # Row normalization keeps the f32 SVD well conditioned with
    # pixel-scale (~1e3) projection entries.
    A = A / (jnp.linalg.norm(A, axis=-1, keepdims=True) + 1e-12)
    _, _, Vt = jnp.linalg.svd(A)
    X_h = Vt[..., 3, :]                  # right singular vector, smallest sv
    w = X_h[..., 3:4]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return X_h[..., :3] / w
