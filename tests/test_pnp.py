import jax
import jax.numpy as jnp
import numpy as np

from slam1_tpu.config import TrackingConfig
from slam1_tpu.ops import se3
from slam1_tpu.ops.camera import StereoCamera, project
from slam1_tpu.ops.pnp import ransac_pnp


def make_problem(key, n=256, outlier_frac=0.0, noise_px=0.0,
                 xi_true=(0.2, -0.1, 0.8, 0.01, 0.03, -0.02)):
    cam = StereoCamera.kitti_default()
    ks = jax.random.split(key, 4)
    X = jnp.stack([
        jax.random.uniform(ks[0], (n,), minval=-15, maxval=15),
        jax.random.uniform(ks[1], (n,), minval=-4, maxval=4),
        jax.random.uniform(ks[2], (n,), minval=4, maxval=50),
    ], axis=-1)
    xi = jnp.asarray(xi_true, jnp.float32)
    T = se3.exp_se3(xi)
    uv, _ = project(cam, se3.transform_points(T, X))
    if noise_px:
        uv = uv + noise_px * jax.random.normal(ks[3], uv.shape)
    mask = jnp.ones(n, bool)
    if outlier_frac:
        n_out = int(n * outlier_frac)
        bad = jax.random.uniform(jax.random.fold_in(key, 9), (n_out, 2),
                                 minval=0, maxval=500)
        uv = uv.at[:n_out].set(bad)
    return cam, X, uv, mask, xi


def test_pnp_exact_recovery(rng):
    cam, X, uv, mask, xi_true = make_problem(rng)
    cfg = TrackingConfig(ransac_iters=32)
    res = ransac_pnp(rng, X, uv, mask, cam, cfg)
    assert bool(res.ok)
    xi_got = se3.log_se3(res.T)
    np.testing.assert_allclose(np.asarray(xi_got), np.asarray(xi_true),
                               atol=1e-3)
    assert int(res.num_inliers) > 250


def test_pnp_with_outliers(rng):
    cam, X, uv, mask, xi_true = make_problem(rng, outlier_frac=0.4)
    cfg = TrackingConfig(ransac_iters=128)
    res = ransac_pnp(rng, X, uv, mask, cam, cfg)
    assert bool(res.ok)
    xi_got = se3.log_se3(res.T)
    np.testing.assert_allclose(np.asarray(xi_got), np.asarray(xi_true),
                               atol=5e-3)
    # outliers rejected
    assert int(res.num_inliers) >= 0.55 * X.shape[0]
    assert not bool(res.inliers[0])


def test_pnp_with_noise(rng):
    cam, X, uv, mask, xi_true = make_problem(rng, noise_px=0.5)
    cfg = TrackingConfig(ransac_iters=64)
    res = ransac_pnp(rng, X, uv, mask, cam, cfg)
    assert bool(res.ok)
    t_err = np.linalg.norm(np.asarray(res.T[:3, 3] - se3.exp_se3(
        jnp.asarray(xi_true))[:3, 3]))
    assert t_err < 0.05
    assert float(res.mean_err) < 1.5


def test_pnp_insufficient_points(rng):
    cam, X, uv, mask, _ = make_problem(rng, n=32)
    mask = mask.at[4:].set(False)  # only 4 valid < min_track_points
    cfg = TrackingConfig(ransac_iters=16)
    res = ransac_pnp(rng, X, uv, mask, cam, cfg)
    assert not bool(res.ok)


def test_pnp_agrees_with_opencv(rng):
    import cv2
    cam, X, uv, mask, xi_true = make_problem(rng, noise_px=0.3,
                                             outlier_frac=0.2)
    cfg = TrackingConfig(ransac_iters=128)
    res = ransac_pnp(rng, X, uv, mask, cam, cfg)
    K = np.asarray(cam.K, np.float64)
    okcv, rvec, tvec, inl = cv2.solvePnPRansac(
        np.asarray(X, np.float64), np.asarray(uv, np.float64), K, None,
        reprojectionError=3.0, flags=cv2.SOLVEPNP_ITERATIVE)
    assert okcv
    t_cv = tvec.ravel()
    t_ours = np.asarray(res.T[:3, 3], np.float64)
    np.testing.assert_allclose(t_ours, t_cv, atol=0.05)


def test_pnp_motion_prior_helps_large_motion(rng):
    xi_big = (0.5, 0.2, 2.0, 0.05, 0.3, 0.1)
    cam, X, uv, mask, xi_true = make_problem(rng, xi_true=xi_big)
    cfg = TrackingConfig(ransac_iters=64, gn_iters_hypo=8)
    prior = jnp.asarray(xi_big) + 0.05
    res = ransac_pnp(rng, X, uv, mask, cam, cfg, xi_init=prior)
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(se3.log_se3(res.T)),
                               np.asarray(xi_true), atol=1e-2)
