"""Full-pipeline integration on a synthetic loop sequence
(BASELINE configs 2-3: mapping + place recognition + loop closure)."""

import jax
import numpy as np
import pytest

from slam1_tpu.config import tiny_config
from slam1_tpu.models import pipeline
from slam1_tpu.utils.evalmetrics import ate_rmse
from slam1_tpu.utils.synthetic import make_world, render_sequence


@pytest.fixture(scope="module")
def loop_run():
    cfg = tiny_config()
    # loop trajectory so place recognition has something to find
    world = make_world(jax.random.PRNGKey(3), n_frames=36, n_points=2500,
                       trajectory="loop", speed=0.9,
                       image_hw=(cfg.image.height, cfg.image.width))
    lefts, rights = render_sequence(world, cfg.image.height,
                                    cfg.image.width)
    poses, sys_ = pipeline.run(lefts, rights, world.cam, cfg,
                               bow_train_frame=8)
    return cfg, world, poses, sys_


def test_pipeline_tracks(loop_run):
    cfg, world, poses, sys_ = loop_run
    gt = np.asarray(world.poses)
    assert poses.shape == gt.shape
    ate = ate_rmse(poses, gt, align=False)
    assert ate < 2.0, f"ATE {ate}"


def test_pipeline_builds_map(loop_run):
    cfg, world, poses, sys_ = loop_run
    st = sys_.state
    n_landmarks = int(st.map.valid.sum())
    assert n_landmarks > 100
    assert n_landmarks <= cfg.mapping.capacity
    assert int(st.map.obs_cursor) > n_landmarks  # some merges happened


def test_pipeline_bow_trained(loop_run):
    cfg, world, poses, sys_ = loop_run
    assert bool(sys_.state.bow.trained)
    # db rows populated for frames after training
    assert int(sys_.state.bow.db_mask.sum()) > 10


def test_pipeline_keyframes(loop_run):
    cfg, world, poses, sys_ = loop_run
    assert int(sys_.state.kf.n) == 36


def test_pipeline_metrics(loop_run):
    cfg, world, poses, sys_ = loop_run
    oks = [bool(m.pnp_ok) for m in sys_.metrics]
    assert np.mean(oks) > 0.7
