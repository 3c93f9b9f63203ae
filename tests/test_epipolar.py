import jax
import jax.numpy as jnp
import numpy as np

from slam1_tpu.ops import se3
from slam1_tpu.ops.camera import StereoCamera, project
from slam1_tpu.ops.epipolar import (ransac_fundamental, recover_pose_2d2d,
                                    sampson_distance)


def two_view_problem(seed=0, n=128, outliers=0):
    rng = np.random.default_rng(seed)
    cam = StereoCamera.kitti_default()
    X = np.stack([rng.uniform(-12, 12, n), rng.uniform(-4, 4, n),
                  rng.uniform(5, 50, n)], -1).astype(np.float32)
    T = se3.exp_se3(jnp.asarray([0.3, 0.05, 0.5, 0.02, 0.04, 0.01]))
    uv1, _ = project(cam, jnp.asarray(X))
    uv2, _ = project(cam, se3.transform_points(T, jnp.asarray(X)))
    uv2 = np.array(uv2)  # writable copy (np.asarray of a jax array is read-only)
    if outliers:
        sel = rng.choice(n, outliers, replace=False)
        uv2[sel] += rng.uniform(20, 60, (outliers, 2))
    return np.asarray(uv1), uv2, np.ones(n, bool)


def test_fmat_clean(rng):
    uv1, uv2, mask = two_view_problem()
    res = ransac_fundamental(rng, jnp.asarray(uv1), jnp.asarray(uv2),
                             jnp.asarray(mask), iters=64)
    assert bool(res.ok)
    assert int(res.num_inliers) > 120
    d = np.asarray(sampson_distance(res.F, jnp.asarray(uv1),
                                    jnp.asarray(uv2)))
    assert np.median(d) < 1.0


def test_fmat_rejects_outliers(rng):
    uv1, uv2, mask = two_view_problem(outliers=40)
    res = ransac_fundamental(rng, jnp.asarray(uv1), jnp.asarray(uv2),
                             jnp.asarray(mask), iters=128)
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    assert inl.sum() >= 80
    # the corrupted rows should mostly be excluded
    d = np.asarray(sampson_distance(res.F, jnp.asarray(uv1),
                                    jnp.asarray(uv2)))
    assert (d[inl] < 2.25).all()


def test_recover_pose_2d2d(rng):
    """Essential-matrix monocular pose (ref visual_odometry_solution_
    methods.py:50-68): rotation recovered exactly, translation up to
    scale, correct cheirality branch chosen."""
    cam = StereoCamera.kitti_default()
    T_true = np.asarray(se3.exp_se3(
        jnp.asarray([0.3, 0.05, 0.5, 0.02, 0.04, 0.01])))
    uv1, uv2, mask = two_view_problem(outliers=8)
    res = recover_pose_2d2d(rng, jnp.asarray(uv1), jnp.asarray(uv2),
                            jnp.asarray(mask), jnp.asarray(cam.K),
                            iters=128)
    assert bool(res.ok)
    T = np.asarray(res.T)
    # rotation error (degrees)
    dR = T[:3, :3].T @ T_true[:3, :3]
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.5, ang
    # translation direction (unit-scale) within a few degrees
    t_est = T[:3, 3] / np.linalg.norm(T[:3, 3])
    t_gt = T_true[:3, 3] / np.linalg.norm(T_true[:3, 3])
    cosang = float(np.dot(t_est, t_gt))
    assert cosang > 0.99, cosang


def test_fmat_agrees_with_opencv(rng):
    import cv2
    uv1, uv2, mask = two_view_problem(outliers=10)
    res = ransac_fundamental(rng, jnp.asarray(uv1), jnp.asarray(uv2),
                             jnp.asarray(mask), iters=128)
    F_cv, _ = cv2.findFundamentalMat(uv1, uv2, cv2.FM_LMEDS)
    # compare via sampson distances of clean points
    d_ours = np.asarray(sampson_distance(res.F, jnp.asarray(uv1),
                                         jnp.asarray(uv2)))[10:]
    d_cv = np.asarray(sampson_distance(jnp.asarray(F_cv, jnp.float32),
                                       jnp.asarray(uv1),
                                       jnp.asarray(uv2)))[10:]
    assert np.median(d_ours) < max(4 * np.median(d_cv), 0.5)
