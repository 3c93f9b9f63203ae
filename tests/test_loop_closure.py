import jax
import jax.numpy as jnp
import numpy as np

from slam1_tpu.config import tiny_config
from slam1_tpu.models import mapping
from slam1_tpu.models.frontend import stereo_frontend
from slam1_tpu.models.loop_closure import verify_loop_pair
from slam1_tpu.ops import se3
from slam1_tpu.utils.synthetic import make_world, render_frame


def test_verify_loop_pair_recovers_relative_pose(rng):
    """Render the same world from two nearby poses; keyframe-pair
    verification should recover the true relative transform."""
    import dataclasses
    cfg = tiny_config()
    # Keyframe-vs-keyframe matching only sees each snapshot's STEREO
    # observations (not the full feature set); the tiny 2x4x24 grid
    # leaves ~70 of them, right at the min_loop_inliers=20 gate. Use a
    # denser grid so the test probes geometry, not the capacity floor.
    cfg = dataclasses.replace(
        cfg, detector=dataclasses.replace(cfg.detector, kp_per_tile=48))
    hw = (cfg.image.height, cfg.image.width)
    world = make_world(rng, n_frames=20, n_points=2000, trajectory="loop",
                       speed=0.5, image_hw=hw)

    store = mapping.init_kf_store(4, k=256)
    for f in (0, 1):
        l, r = render_frame(world, f, *hw)
        _, obs = stereo_frontend(l, r, world.cam, cfg)
        store = mapping.kf_insert(store, obs, world.poses[f], k=256,
                                  frame=f)

    # candidate = frame 0, hit = frame 1 (anchor resolves to kf 1)
    res = verify_loop_pair(rng, store, 0, 1, world.cam, cfg)
    assert bool(res.ok), \
        f"loop verification failed ({int(res.num_inliers)} inliers)"
    assert int(res.anchor_frame) == 1
    # T_anchor_cand should match GT: inv(T_w_1) @ T_w_0
    T_true = se3.inverse(world.poses[1]) @ world.poses[0]
    err_t = float(jnp.linalg.norm(res.T_anchor_cand[:3, 3]
                                  - T_true[:3, 3]))
    assert err_t < 0.1, err_t


def test_verify_loop_pair_rejects_unrelated_frame(rng):
    """A keyframe looking at completely different content must not
    verify."""
    cfg = tiny_config()
    hw = (cfg.image.height, cfg.image.width)
    w1 = make_world(rng, n_frames=4, n_points=800, image_hw=hw)
    w2 = make_world(jax.random.fold_in(rng, 7), n_frames=4, n_points=800,
                    image_hw=hw)
    store = mapping.init_kf_store(4, k=256)
    l0, r0 = render_frame(w1, 0, *hw)
    _, obs0 = stereo_frontend(l0, r0, w1.cam, cfg)
    store = mapping.kf_insert(store, obs0, w1.poses[0], k=256, frame=0)
    lx, rx = render_frame(w2, 0, *hw)
    _, obsx = stereo_frontend(lx, rx, w2.cam, cfg)
    store = mapping.kf_insert(store, obsx, w2.poses[0], k=256, frame=1)
    res = verify_loop_pair(rng, store, 0, 1, w1.cam, cfg)
    assert int(res.num_inliers) < 12
    assert not bool(res.ok)
