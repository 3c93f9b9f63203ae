"""End-to-end VO slice on a synthetic sequence (BASELINE config 1)."""

import jax
import numpy as np
import pytest

from slam1_tpu.config import tiny_config
from slam1_tpu.models import vo
from slam1_tpu.utils.evalmetrics import ate_rmse, rpe
from slam1_tpu.utils.synthetic import make_world, render_sequence


@pytest.fixture(scope="module")
def sequence():
    key = jax.random.PRNGKey(42)
    cfg = tiny_config()
    world = make_world(key, n_frames=12, n_points=1500, trajectory="arc",
                       speed=0.8,
                       image_hw=(cfg.image.height, cfg.image.width))
    lefts, rights = render_sequence(world, cfg.image.height, cfg.image.width)
    return cfg, world, lefts, rights


def test_vo_tracks_synthetic_sequence(sequence):
    cfg, world, lefts, rights = sequence
    poses, metrics = vo.run_sequence(lefts, rights, world.cam, cfg)
    gt = np.asarray(world.poses)
    assert poses.shape == gt.shape
    # Per-frame motion is ~0.8m; demand trajectory-level accuracy.
    err = ate_rmse(poses, gt, align=False)
    assert err < 0.5, f"ATE {err}"
    t_rpe, r_rpe = rpe(poses, gt)
    # 0.15 m/frame at ~0.8 m/frame motion: the test camera's fx ~ 150
    # bounds per-frame translation noise via triangulated-depth noise
    # (sigma_z ~ z^2 sigma_d / (fx b), metres at z ~ 20); the
    # trajectory-level ATE bound above is the accuracy statement.
    assert t_rpe < 0.15, f"RPE-t {t_rpe}"
    # most frames should have tracked successfully
    ok = [bool(m.pnp_ok) for m in metrics]
    assert np.mean(ok) > 0.8


def test_vo_metrics_sane(sequence):
    cfg, world, lefts, rights = sequence
    _, metrics = vo.run_sequence(lefts, rights, world.cam, cfg)
    m = metrics[len(metrics) // 2]
    assert int(m.num_stereo) > 20
    assert int(m.num_temporal) > 10
    assert int(m.num_inliers) > 8
    assert float(m.mean_reproj_err) < 3.0
