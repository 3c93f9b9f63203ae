import jax
import jax.numpy as jnp
import numpy as np

from slam1_tpu.config import tiny_config
from slam1_tpu.models import mapping
from slam1_tpu.models.frontend import stereo_frontend
from slam1_tpu.models.loop_closure import verify_loop
from slam1_tpu.ops import se3
from slam1_tpu.utils.synthetic import make_world, render_frame


def test_verify_loop_recovers_relative_pose(rng):
    """Render the same world from two nearby poses; verification should
    recover the true relative transform."""
    cfg = tiny_config()
    hw = (cfg.image.height, cfg.image.width)
    world = make_world(rng, n_frames=20, n_points=2000, trajectory="loop",
                       speed=0.5, image_hw=hw)

    # keyframe at frame 0
    l0, r0 = render_frame(world, 0, *hw)
    feats0, obs0 = stereo_frontend(l0, r0, world.cam, cfg)
    store = mapping.init_kf_store(4, k=256)
    store = mapping.kf_insert(store, obs0, world.poses[0], k=256)

    # "current" frame = frame 1 (overlapping view)
    l1, r1 = render_frame(world, 1, *hw)
    feats1, _ = stereo_frontend(l1, r1, world.cam, cfg)

    res = verify_loop(rng, store, 0, feats1, world.cam, cfg)
    assert bool(res.ok), f"loop verification failed ({int(res.num_inliers)} inliers)"
    # T_cur_kf should match GT: inv(T_w_1) @ T_w_0
    T_true = se3.inverse(world.poses[1]) @ world.poses[0]
    err_t = float(jnp.linalg.norm(res.T_cur_kf[:3, 3] - T_true[:3, 3]))
    assert err_t < 0.1, err_t
    # corrected world pose close to GT pose of frame 1
    err_w = float(jnp.linalg.norm(res.T_w_corrected[:3, 3]
                                  - world.poses[1][:3, 3]))
    assert err_w < 0.1, err_w


def test_verify_loop_rejects_unrelated_frame(rng):
    """A keyframe looking at completely different content must not
    verify."""
    cfg = tiny_config()
    hw = (cfg.image.height, cfg.image.width)
    w1 = make_world(rng, n_frames=4, n_points=800, image_hw=hw)
    w2 = make_world(jax.random.fold_in(rng, 7), n_frames=4, n_points=800,
                    image_hw=hw)
    l0, r0 = render_frame(w1, 0, *hw)
    f0, obs0 = stereo_frontend(l0, r0, w1.cam, cfg)
    store = mapping.init_kf_store(4, k=256)
    store = mapping.kf_insert(store, obs0, w1.poses[0], k=256)
    lx, rx = render_frame(w2, 0, *hw)
    fx, _ = stereo_frontend(lx, rx, w2.cam, cfg)
    res = verify_loop(rng, store, 0, fx, w1.cam, cfg)
    assert int(res.num_inliers) < 12
