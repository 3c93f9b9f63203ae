"""Pyramidal LK optical flow: known-shift recovery + OpenCV oracle
(the reference tracks with cv2.calcOpticalFlowPyrLK,
/root/reference/visual_odometry.py:98-111)."""

import jax.numpy as jnp
import numpy as np
import pytest

from slam1_tpu.ops import lk


def _smooth_texture(rng, h, w, sigma=3):
    img = rng.uniform(0, 1, (h, w)).astype(np.float32)
    # cheap separable smoothing so gradients are well-behaved
    k = np.exp(-0.5 * (np.arange(-7, 8) / sigma) ** 2)
    k /= k.sum()
    img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
    img = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, img)
    img = (img - img.min()) / (img.max() - img.min())
    return img.astype(np.float32)


def _shift_bilinear(img, dx, dy):
    """Sample img at (x - dx, y - dy): content moves by (+dx, +dy)."""
    h, w = img.shape
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    x = np.clip(xs - dx, 0, w - 1.001)
    y = np.clip(ys - dy, 0, h - 1.001)
    x0, y0 = x.astype(int), y.astype(int)
    fx, fy = x - x0, y - y0
    out = (img[y0, x0] * (1 - fx) * (1 - fy)
           + img[y0, x0 + 1] * fx * (1 - fy)
           + img[y0 + 1, x0] * (1 - fx) * fy
           + img[y0 + 1, x0 + 1] * fx * fy)
    return out.astype(np.float32)


def _grid_points(h, w, margin=20, step=12):
    ys, xs = np.meshgrid(np.arange(margin, h - margin, step),
                         np.arange(margin, w - margin, step), indexing="ij")
    return np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.float32)


def test_lk_recovers_subpixel_shift():
    rng = np.random.default_rng(0)
    img = _smooth_texture(rng, 120, 160)
    dx, dy = 3.6, -2.3
    nxt = _shift_bilinear(img, dx, dy)
    pts = _grid_points(120, 160)
    res = lk.lk_track(jnp.asarray(img), jnp.asarray(nxt), jnp.asarray(pts),
                      jnp.ones(len(pts), bool))
    flow = np.asarray(res.xy) - pts
    ok = np.asarray(res.mask)
    assert ok.mean() > 0.8
    err = np.linalg.norm(flow[ok] - [dx, dy], axis=-1)
    assert np.median(err) < 0.15, np.median(err)
    assert (err < 0.5).mean() > 0.9


def test_lk_large_motion_needs_pyramid():
    rng = np.random.default_rng(1)
    img = _smooth_texture(rng, 120, 160, sigma=4)
    dx = 11.0  # larger than the 11px window: only the pyramid can get it
    nxt = _shift_bilinear(img, dx, 0.0)
    pts = _grid_points(120, 160)
    res = lk.lk_track(jnp.asarray(img), jnp.asarray(nxt), jnp.asarray(pts),
                      jnp.ones(len(pts), bool), levels=4)
    flow = np.asarray(res.xy) - pts
    ok = np.asarray(res.mask)
    err = np.abs(flow[ok, 0] - dx)
    assert ok.mean() > 0.5
    assert np.median(err) < 0.3, np.median(err)


def test_lk_invalid_mask_propagates():
    rng = np.random.default_rng(2)
    img = _smooth_texture(rng, 64, 64)
    pts = np.array([[32.0, 32.0], [40.0, 40.0]], np.float32)
    mask = np.array([True, False])
    res = lk.lk_track(jnp.asarray(img), jnp.asarray(img), jnp.asarray(pts),
                      jnp.asarray(mask))
    assert not bool(res.mask[1])


def test_lk_vs_opencv_oracle():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    img = _smooth_texture(rng, 120, 160)
    nxt = _shift_bilinear(img, 2.7, 1.4)
    pts = _grid_points(120, 160)

    res = lk.lk_track(jnp.asarray(img), jnp.asarray(nxt), jnp.asarray(pts),
                      jnp.ones(len(pts), bool))
    u8p = (img * 255).astype(np.uint8)
    u8n = (nxt * 255).astype(np.uint8)
    cv_pts, cv_st, _ = cv2.calcOpticalFlowPyrLK(
        u8p, u8n, pts.reshape(-1, 1, 2), None, winSize=(11, 11), maxLevel=2)
    cv_pts = cv_pts.reshape(-1, 2)
    both = np.asarray(res.mask) & (cv_st.reshape(-1) == 1)
    assert both.mean() > 0.7
    d = np.linalg.norm(np.asarray(res.xy)[both] - cv_pts[both], axis=-1)
    assert np.median(d) < 0.3, np.median(d)
