import jax
import jax.numpy as jnp
import numpy as np

from slam1_tpu.config import BAConfig
from slam1_tpu.models.ba import BAProblem, bundle_adjust, window_problem
from slam1_tpu.ops import se3
from slam1_tpu.ops.camera import StereoCamera, project_world


def make_ba_problem(seed=0, n_cams=6, n_pts=120, pose_noise=0.02,
                    point_noise=0.05, px_noise=0.2, n_outliers=0):
    rng = np.random.default_rng(seed)
    cam = StereoCamera.kitti_default()
    # ground truth trajectory: forward motion with slight yaw
    xi = jnp.asarray(np.tile([0, 0, 1.2, 0, 0.01, 0], (n_cams - 1, 1)),
                     jnp.float32)
    T = [jnp.eye(4)]
    for i in range(n_cams - 1):
        T.append(T[-1] @ se3.exp_se3(xi[i]))
    T_true = jnp.stack(T)
    pts_true = jnp.asarray(np.stack([
        rng.uniform(-15, 15, n_pts), rng.uniform(-4, 3, n_pts),
        rng.uniform(8, 50, n_pts)], -1), jnp.float32)

    cam_idx, lm_idx, uvs, urs = [], [], [], []
    for c in range(n_cams):
        uv, valid = project_world(cam, T_true[c], pts_true)
        Xc = np.asarray(se3.transform_points(se3.inverse(T_true[c]),
                                             pts_true))
        ur = np.asarray(cam.fx) * (Xc[:, 0] - np.asarray(cam.baseline)) \
            / np.maximum(Xc[:, 2], 1e-3) + np.asarray(cam.cx)
        v = np.asarray(valid)
        uv = np.asarray(uv)
        inb = v & (uv[:, 0] > 0) & (uv[:, 0] < 1226) & (uv[:, 1] > 0) \
            & (uv[:, 1] < 370)
        for l in np.nonzero(inb)[0]:
            cam_idx.append(c)
            lm_idx.append(l)
            uvs.append(uv[l])
            urs.append(ur[l])
    cam_idx = np.array(cam_idx, np.int32)
    lm_idx = np.array(lm_idx, np.int32)
    uvs = np.stack(uvs).astype(np.float32)
    uvs += rng.normal(0, px_noise, uvs.shape).astype(np.float32)
    urs = np.array(urs, np.float32)
    urs += rng.normal(0, px_noise, urs.shape).astype(np.float32)
    w = np.ones(len(uvs), np.float32)
    if n_outliers:
        sel = rng.choice(len(uvs), n_outliers, replace=False)
        uvs[sel] += rng.uniform(30, 80, (n_outliers, 2))
        urs[sel] += rng.uniform(30, 80, n_outliers).astype(np.float32)

    # perturb initial estimate
    dpose = rng.normal(0, pose_noise, (n_cams, 6)).astype(np.float32)
    dpose[0] = 0
    T_init = T_true @ se3.exp_se3(jnp.asarray(dpose))
    pts_init = pts_true + jnp.asarray(
        rng.normal(0, point_noise, (n_pts, 3)).astype(np.float32))

    from slam1_tpu.models.ba import make_problem
    prob = make_problem(poses=T_init, points=pts_init,
                     cam_idx=jnp.asarray(cam_idx),
                     lm_idx=jnp.asarray(lm_idx), uv=jnp.asarray(uvs),
                     w=jnp.asarray(w), ur=jnp.asarray(urs),
                     wr=jnp.asarray(w))
    return prob, T_true, pts_true, cam


def pose_err(T_est, T_true):
    return float(jnp.linalg.norm(T_est[:, :3, 3] - T_true[:, :3, 3],
                                 axis=-1).max())


def test_ba_converges_clean():
    prob, T_true, pts_true, cam = make_ba_problem(px_noise=0.0)
    cfg = BAConfig(lm_iters=10, cg_iters=40)
    before = pose_err(prob.poses, T_true)
    out, cost = bundle_adjust(prob, cam, cfg)
    after = pose_err(out.poses, T_true)
    assert after < before * 0.1, (before, after)
    assert after < 5e-3
    pt_err = float(jnp.linalg.norm(out.points - pts_true, axis=-1).mean())
    assert pt_err < 0.05


def test_ba_with_noise_and_outliers():
    prob, T_true, pts_true, cam = make_ba_problem(px_noise=0.3,
                                                  n_outliers=40)
    cfg = BAConfig(lm_iters=12, cg_iters=40, huber_delta=2.0)
    before = pose_err(prob.poses, T_true)
    out, cost = bundle_adjust(prob, cam, cfg)
    after = pose_err(out.poses, T_true)
    assert after < before * 0.5, (before, after)
    assert after < 0.05


def test_ba_cost_decreases():
    prob, T_true, pts_true, cam = make_ba_problem()
    from slam1_tpu.models.ba import _cost
    cfg = BAConfig(lm_iters=8, cg_iters=30)
    c0, _, _ = _cost(prob, cam, cfg.huber_delta)
    out, c1 = bundle_adjust(prob, cam, cfg)
    assert float(c1) < float(c0)


def test_ba_gauge_fixed():
    prob, T_true, pts_true, cam = make_ba_problem()
    cfg = BAConfig(lm_iters=5, cg_iters=30)
    out, _ = bundle_adjust(prob, cam, cfg)
    np.testing.assert_allclose(np.asarray(out.poses[0]),
                               np.asarray(prob.poses[0]), atol=1e-5)


def test_window_problem_masks_outside():
    prob, *_ = make_ba_problem(n_cams=6)
    wp = window_problem(prob.poses, prob.points, prob.cam_idx, prob.lm_idx,
                        prob.uv, prob.w, first_cam=2, n_cams=3,
                        ur=prob.ur, wr=prob.wr)
    ci = np.asarray(prob.cam_idx)
    w = np.asarray(wp.w)
    assert (w[(ci < 2) | (ci >= 5)] == 0).all()
    assert (w[(ci >= 2) & (ci < 5)] == 1).all()
