"""Stereo block-matching/SGM disparity: known-disparity recovery + the
per-keypoint lookup used by the flow VO (reference StereoSGBM usage,
/root/reference/visual_odometry.py:19-23,113-126)."""

import jax.numpy as jnp
import numpy as np
import pytest

from slam1_tpu.ops import disparity as dops


def _texture(rng, h, w):
    img = rng.uniform(0, 1, (h, w)).astype(np.float32)
    k = np.array([1, 4, 6, 4, 1], np.float32) / 16
    img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
    img = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, img)
    return ((img - img.min()) / (img.max() - img.min())).astype(np.float32)


def _make_pair(rng, h=96, w=160, d=7):
    """right[y,x] = left[y,x+d] (disparity = x_l - x_r = d)."""
    wide = _texture(rng, h, w + 48)
    left = wide[:, 4:4 + w]
    right = wide[:, 4 + d:4 + d + w]
    return left, right


def test_constant_disparity_recovered():
    rng = np.random.default_rng(0)
    d_true = 7
    left, right = _make_pair(rng, d=d_true)
    res = dops.disparity(jnp.asarray(left), jnp.asarray(right),
                         max_disp=32, radius=3)
    disp = np.asarray(res.disp)
    valid = np.asarray(res.valid)
    interior = np.zeros_like(valid)
    interior[8:-8, 40:-8] = True
    sel = valid & interior
    assert sel.mean() > 0.5
    err = np.abs(disp[sel] - d_true)
    assert np.median(err) < 0.3, np.median(err)
    assert (err < 1.0).mean() > 0.9


def test_piecewise_disparity_sgm():
    rng = np.random.default_rng(1)
    h, w = 96, 160
    d_near, d_far = 12, 4
    wide = _texture(rng, h, w + 48)
    left = wide[:, 4:4 + w]
    right = np.empty_like(left)
    right[:h // 2] = wide[:h // 2, 4 + d_far:4 + d_far + w]
    right[h // 2:] = wide[h // 2:, 4 + d_near:4 + d_near + w]
    res = dops.disparity(jnp.asarray(left), jnp.asarray(right),
                         max_disp=32, radius=3, sgm=True)
    disp = np.asarray(res.disp)
    valid = np.asarray(res.valid)
    top = valid[8:h // 2 - 6, 40:-8] & True
    bot = valid[h // 2 + 6:-8, 40:-8] & True
    dt = disp[8:h // 2 - 6, 40:-8][top]
    db = disp[h // 2 + 6:-8, 40:-8][bot]
    assert np.median(np.abs(dt - d_far)) < 0.5
    assert np.median(np.abs(db - d_near)) < 0.5


def test_lr_check_kills_ambiguous():
    # A vertically-striped (periodic) image is ambiguous; LR+uniqueness
    # should invalidate most of it rather than return confident garbage.
    h, w = 64, 128
    xs = np.arange(w, dtype=np.float32)
    period = np.sin(xs * (2 * np.pi / 8))[None, :].repeat(h, 0) * 0.5 + 0.5
    res = dops.disparity(jnp.asarray(period), jnp.asarray(period),
                         max_disp=32, radius=3)
    assert np.asarray(res.valid).mean() < 0.5


def test_sample_disparity_lookup():
    rng = np.random.default_rng(2)
    left, right = _make_pair(rng, d=6)
    res = dops.disparity(jnp.asarray(left), jnp.asarray(right),
                         max_disp=32, radius=3)
    pts = jnp.asarray(np.array([[80.0, 48.0], [100.0, 30.0]], np.float32))
    d, ok = dops.sample_disparity(res, pts)
    d, ok = np.asarray(d), np.asarray(ok)
    assert ok.all()
    np.testing.assert_allclose(d, 6.0, atol=1.0)


def test_vs_opencv_oracle():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    left, right = _make_pair(rng, h=96, w=192, d=9)
    res = dops.disparity(jnp.asarray(left), jnp.asarray(right),
                         max_disp=32, radius=3)
    sgbm = cv2.StereoSGBM_create(minDisparity=0, numDisparities=32,
                                 blockSize=7)
    cvd = sgbm.compute((left * 255).astype(np.uint8),
                       (right * 255).astype(np.uint8)) / 16.0
    ours = np.asarray(res.disp)
    valid = np.asarray(res.valid) & (cvd > 0)
    sel = np.zeros_like(valid)
    sel[8:-8, 40:-8] = True
    m = valid & sel
    assert m.mean() > 0.4
    agree = np.abs(ours[m] - cvd[m])
    assert np.median(agree) < 1.0, np.median(agree)
