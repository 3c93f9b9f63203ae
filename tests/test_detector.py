import jax
import jax.numpy as jnp
import numpy as np

from slam1_tpu.config import tiny_config
from slam1_tpu.ops import detector, hamming
from slam1_tpu.utils.synthetic import make_world, render_frame


def test_detect_shapes_and_masks(rng):
    cfg = tiny_config()
    world = make_world(rng, n_frames=4, n_points=600,
                       image_hw=(cfg.image.height, cfg.image.width))
    left, _ = render_frame(world, 0, cfg.image.height, cfg.image.width)
    feats = detector.detect(left, cfg.detector)
    n = cfg.detector.max_kp
    assert feats.xy.shape == (n, 2)
    assert feats.desc.shape == (n, cfg.detector.brief_pairs // 8)
    assert feats.mask.shape == (n,)
    assert int(feats.mask.sum()) > 30
    # all valid keypoints inside the margin
    m = np.asarray(feats.mask)
    xy = np.asarray(feats.xy)[m]
    margin = cfg.detector.patch_size // 2
    assert (xy[:, 0] >= margin).all() and (xy[:, 0] < cfg.image.width - margin).all()
    assert (xy[:, 1] >= margin).all() and (xy[:, 1] < cfg.image.height - margin).all()


def test_detect_finds_rendered_landmarks(rng):
    """Detections should land near projected synthetic landmarks."""
    from slam1_tpu.ops import se3
    from slam1_tpu.ops.camera import project_stereo
    cfg = tiny_config()
    world = make_world(rng, n_frames=4, n_points=400,
                       image_hw=(cfg.image.height, cfg.image.width))
    left, _ = render_frame(world, 1, cfg.image.height, cfg.image.width)
    feats = detector.detect(left, cfg.detector)
    X_cam = se3.transform_points(se3.inverse(world.poses[1]), world.points)
    uv_l, _, vis = project_stereo(world.cam, X_cam)
    uv = np.asarray(uv_l)[np.asarray(vis)]
    inb = ((uv[:, 0] > 20) & (uv[:, 0] < cfg.image.width - 20)
           & (uv[:, 1] > 20) & (uv[:, 1] < cfg.image.height - 20))
    uv = uv[inb]
    kp = np.asarray(feats.xy)[np.asarray(feats.mask)]
    # Detections land on texture corners anywhere inside a landmark's
    # 9x9 stamped patch, so require proximity to the patch region (its
    # half-diagonal ~6.4 px), not to the exact centre.
    d = np.linalg.norm(kp[:, None, :] - uv[None, :, :], axis=-1).min(1)
    assert (d < 7.0).mean() > 0.8, (d < 7.0).mean()


def test_stereo_matching_recovers_disparity(rng):
    """L/R detections of the same frame should match with consistent rows."""
    cfg = tiny_config()
    world = make_world(rng, n_frames=4, n_points=400,
                       image_hw=(cfg.image.height, cfg.image.width))
    left, right = render_frame(world, 0, cfg.image.height, cfg.image.width)
    fl = detector.detect(left, cfg.detector)
    fr = detector.detect(right, cfg.detector)
    m = hamming.match(fl.desc, fr.desc, fl.mask, fr.mask,
                      ratio=cfg.matcher.ratio,
                      max_distance=cfg.matcher.max_hamming)
    assert int(m.mask.sum()) > 20
    uv_r = np.asarray(fr.xy)[np.asarray(m.idx)]
    uv_l = np.asarray(fl.xy)
    valid = np.asarray(m.mask)
    dy = np.abs(uv_l[valid, 1] - uv_r[valid, 1])
    disp = uv_l[valid, 0] - uv_r[valid, 0]
    assert np.median(dy) <= 1.0
    assert (disp > 0).mean() > 0.9


def test_detect_batch(rng):
    cfg = tiny_config()
    world = make_world(rng, n_frames=2, n_points=200,
                       image_hw=(cfg.image.height, cfg.image.width))
    l0, _ = render_frame(world, 0, cfg.image.height, cfg.image.width)
    l1, _ = render_frame(world, 1, cfg.image.height, cfg.image.width)
    batch = jnp.stack([l0, l1])
    feats = detector.detect_batch(batch, cfg.detector)
    assert feats.xy.shape[0] == 2
