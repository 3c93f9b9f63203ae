import numpy as np

from slam1_tpu.utils.evalmetrics import ate_rmse, final_pose_diff, rpe


def make_traj(n=50, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    poses = []
    T = np.eye(4)
    for i in range(n):
        d = np.eye(4)
        d[2, 3] = 1.0
        th = 0.01
        d[:3, :3] = np.array([[np.cos(th), 0, np.sin(th)],
                              [0, 1, 0],
                              [-np.sin(th), 0, np.cos(th)]])
        T = T @ d
        P = T.copy()
        P[:3, 3] += rng.normal(0, noise, 3)
        poses.append(P)
    return np.stack(poses)


def test_ate_zero_on_identical():
    gt = make_traj()
    assert ate_rmse(gt, gt, align=False) < 1e-9
    assert ate_rmse(gt, gt, align=True) < 1e-9


def test_ate_invariant_to_rigid_offset():
    gt = make_traj()
    R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)
    off = np.eye(4)
    off[:3, :3] = R
    off[:3, 3] = [5, -3, 2]
    est = np.einsum("ij,njk->nik", off, gt)
    assert ate_rmse(est, gt, align=False) > 1.0
    assert ate_rmse(est, gt, align=True) < 1e-6


def test_ate_measures_noise():
    gt = make_traj()
    est = make_traj(noise=0.5)
    v = ate_rmse(est, gt, align=True)
    assert 0.3 < v < 1.5


def test_rpe_zero_on_identical():
    gt = make_traj()
    t, r = rpe(gt, gt)
    assert t < 1e-9 and r < 1e-6


def test_rpe_detects_drift():
    gt = make_traj()
    est = gt.copy()
    est[:, 2, 3] *= 1.01  # 1% scale drift in z translation
    t, r = rpe(est, gt, delta=1)
    assert t > 1e-3


def test_final_pose_diff():
    gt = make_traj()
    est = gt.copy()
    est[-1, :3, 3] += [1.0, -2.0, 3.0]
    np.testing.assert_allclose(final_pose_diff(est, gt), [1.0, 2.0, 3.0])
