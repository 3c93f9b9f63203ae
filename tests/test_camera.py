import jax
import jax.numpy as jnp
import numpy as np

from slam1_tpu.ops import se3
from slam1_tpu.ops.camera import (StereoCamera, backproject, project,
                                  project_stereo, project_world)
from slam1_tpu.ops.triangulate import dlt, stereo_rectified


def test_project_backproject_roundtrip(rng):
    cam = StereoCamera.kitti_default()
    X = jnp.stack([
        jax.random.uniform(rng, (128,), minval=-20, maxval=20),
        jax.random.uniform(jax.random.fold_in(rng, 1), (128,), minval=-5,
                           maxval=5),
        jax.random.uniform(jax.random.fold_in(rng, 2), (128,), minval=2,
                           maxval=60),
    ], axis=-1)
    uv, valid = project(cam, X)
    assert bool(valid.all())
    X2 = backproject(cam, uv, X[..., 2])
    np.testing.assert_allclose(np.asarray(X2), np.asarray(X), rtol=1e-4,
                               atol=1e-4)


def test_stereo_disparity_sign():
    cam = StereoCamera.kitti_default()
    X = jnp.array([[0.0, 0.0, 10.0]])
    uv_l, uv_r, valid = project_stereo(cam, X)
    assert bool(valid.all())
    # right camera is to the right -> features shift left -> positive disparity
    assert float(uv_l[0, 0] - uv_r[0, 0]) > 0
    np.testing.assert_allclose(float(uv_l[0, 1]), float(uv_r[0, 1]), atol=1e-4)


def test_stereo_rectified_triangulation_roundtrip(rng):
    cam = StereoCamera.kitti_default()
    X = jnp.stack([
        jax.random.uniform(rng, (256,), minval=-15, maxval=15),
        jax.random.uniform(jax.random.fold_in(rng, 3), (256,), minval=-4,
                           maxval=4),
        jax.random.uniform(jax.random.fold_in(rng, 4), (256,), minval=3,
                           maxval=70),
    ], axis=-1)
    uv_l, uv_r, _ = project_stereo(cam, X)
    X2, valid = stereo_rectified(cam, uv_l, uv_r)
    assert bool(valid.all())
    np.testing.assert_allclose(np.asarray(X2), np.asarray(X), rtol=1e-3,
                               atol=1e-3)


def test_dlt_matches_rectified(rng):
    cam = StereoCamera.kitti_default()
    X = jnp.array([[1.0, -0.5, 12.0], [-3.0, 1.0, 30.0], [5.0, 0.2, 7.0]])
    uv_l, uv_r, _ = project_stereo(cam, X)
    P_l, P_r = cam.projection_matrices()
    X_dlt = dlt(P_l, P_r, uv_l, uv_r)
    np.testing.assert_allclose(np.asarray(X_dlt), np.asarray(X), rtol=1e-3,
                               atol=1e-3)


def test_dlt_matches_opencv(rng):
    import cv2
    cam = StereoCamera.kitti_default()
    X = np.array([[2.0, -1.0, 15.0], [-4.0, 0.5, 40.0]], np.float64)
    P_l, P_r = (np.asarray(p, np.float64) for p in cam.projection_matrices())
    uv_l = (P_l @ np.c_[X, np.ones(len(X))].T)
    uv_l = (uv_l[:2] / uv_l[2]).T
    uv_r = (P_r @ np.c_[X, np.ones(len(X))].T)
    uv_r = (uv_r[:2] / uv_r[2]).T
    Xh = cv2.triangulatePoints(P_l, P_r, uv_l.T.astype(np.float64),
                               uv_r.T.astype(np.float64))
    X_cv = (Xh[:3] / Xh[3]).T
    X_ours = np.asarray(dlt(jnp.asarray(P_l, jnp.float32),
                            jnp.asarray(P_r, jnp.float32),
                            jnp.asarray(uv_l, jnp.float32),
                            jnp.asarray(uv_r, jnp.float32)))
    np.testing.assert_allclose(X_ours, X_cv, rtol=1e-3, atol=1e-3)


def test_project_world(rng):
    cam = StereoCamera.kitti_default()
    T = se3.exp_se3(jnp.array([1.0, 0.0, 2.0, 0.0, 0.1, 0.0]))
    X_cam = jnp.array([[0.5, 0.2, 9.0]])
    X_world = se3.transform_points(T, X_cam)
    uv_direct, _ = project(cam, X_cam)
    uv_world, valid = project_world(cam, T, X_world)
    assert bool(valid.all())
    np.testing.assert_allclose(np.asarray(uv_world), np.asarray(uv_direct),
                               atol=1e-3)
