import numpy as np

from slam1_tpu.utils import export, viz
from tests.test_eval import make_traj


def test_kitti_pose_roundtrip(tmp_path):
    poses = make_traj(10)
    p = str(tmp_path / "poses.txt")
    export.save_kitti_poses(p, poses)
    back = export.load_kitti_poses(p)
    np.testing.assert_allclose(back, poses.astype(np.float32), atol=1e-5)


def test_bal_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    poses = make_traj(3)
    points = rng.uniform(-10, 10, (20, 3))
    cam_idx = rng.integers(0, 3, 40).astype(np.int32)
    lm_idx = rng.integers(0, 20, 40).astype(np.int32)
    uv = rng.uniform(0, 1000, (40, 2))
    w = np.ones(40)
    w[5] = 0.0  # padding row must be dropped
    p = str(tmp_path / "prob.bal")
    export.save_bal(p, poses, points, cam_idx, lm_idx, uv, w,
                    fx=718.0, cx=607.0, cy=185.0)
    back = export.load_bal(p)
    assert back["cameras"].shape == (3, 9)
    assert back["points"].shape == (20, 3)
    assert len(back["uv"]) == 39
    np.testing.assert_allclose(back["points"], points, rtol=1e-9)
    np.testing.assert_allclose(back["uv"][0], uv[0] - [607.0, 185.0],
                               atol=1e-5)
    np.testing.assert_allclose(back["cameras"][:, 6], 718.0)


def test_viz_outputs_files(tmp_path):
    poses = make_traj(20)
    gt = make_traj(20, noise=0.1, seed=1)
    f1 = viz.plot_trajectories(poses, gt, str(tmp_path / "traj.png"))
    pts = np.random.default_rng(0).uniform(-20, 20, (500, 3))
    valid = np.ones(500, bool)
    f2 = viz.plot_map(pts, valid, poses, str(tmp_path / "map.png"))
    import os
    assert os.path.getsize(f1) > 1000
    assert os.path.getsize(f2) > 1000
