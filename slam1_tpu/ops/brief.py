"""Orientation (intensity centroid) + steered rBRIEF 256-bit descriptors.

TPU-native replacement for cv2.ORB's description stage (reference
/root/reference/orb.py:28-38 relies on OpenCV's compiled rBRIEF). The
sampling pattern is NOT OpenCV's learned table (no code copied); it is a
fixed seeded Gaussian pattern clipped to a disk, which gives descriptors
with the same matching behaviour inside this framework (both sides of
every match use the same pattern).

All stages are batched over keypoints: patch extraction is one gather,
orientation a masked moment reduction, descriptor sampling two gathers —
no per-keypoint Python.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def make_pattern(n_pairs: int = 256, radius: float = 13.0,
                 seed: int = 1234) -> np.ndarray:
    """(n_pairs, 2, 2) float32 (dx, dy) sample-pair offsets within a disk."""
    rng = np.random.RandomState(seed)
    pts = rng.normal(0.0, radius * 0.45, size=(n_pairs * 4, 2))
    pts = pts[np.linalg.norm(pts, axis=1) <= radius][:n_pairs * 2]
    while len(pts) < n_pairs * 2:  # pragma: no cover (overdraw covers this)
        extra = rng.normal(0.0, radius * 0.45, size=(n_pairs, 2))
        extra = extra[np.linalg.norm(extra, axis=1) <= radius]
        pts = np.concatenate([pts, extra])[:n_pairs * 2]
    return pts.reshape(n_pairs, 2, 2).astype(np.float32)


def gaussian_blur(img, sigma: float = 1.4, ksize: int = 7):
    """Separable Gaussian blur of an (H,W) image (descriptor smoothing,
    the counterpart of OpenCV ORB's integral-image box blur)."""
    r = ksize // 2
    x = jnp.arange(-r, r + 1, dtype=img.dtype)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / k.sum()
    pad = [(r, r)]
    img_h = jnp.pad(img, pad + [(0, 0)], mode="edge")
    img_h = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"),
                     in_axes=1, out_axes=1)(img_h)
    img_v = jnp.pad(img_h, [(0, 0)] + pad, mode="edge")
    return jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(img_v)


def extract_patches(img, xy, patch_size: int):
    """Gather (N, P, P) patches centred on integer-rounded keypoints.

    Keypoints too close to the border must be pre-filtered by the
    detector; indices are clipped for safety.
    """
    h, w = img.shape
    r = patch_size // 2
    cx = jnp.round(xy[..., 0]).astype(jnp.int32)
    cy = jnp.round(xy[..., 1]).astype(jnp.int32)
    off = jnp.arange(-r, r + 1)
    yy = jnp.clip(cy[:, None, None] + off[None, :, None], 0, h - 1)
    xx = jnp.clip(cx[:, None, None] + off[None, None, :], 0, w - 1)
    return img[yy, xx]


def orientation(patches):
    """Intensity-centroid angle per patch (N,P,P) -> (N,) radians.

    The moment sum runs over the inscribed disk, matching ORB's circular
    support (IC_Angle).
    """
    p = patches.shape[-1]
    r = p // 2
    off = jnp.arange(-r, r + 1, dtype=patches.dtype)
    oy = off[:, None]
    ox = off[None, :]
    disk = (oy * oy + ox * ox) <= r * r
    w = jnp.where(disk, patches, 0.0)
    m10 = jnp.sum(w * ox, axis=(-2, -1))
    m01 = jnp.sum(w * oy, axis=(-2, -1))
    return jnp.arctan2(m01, m10)


@functools.partial(jax.jit, static_argnames=("n_pairs",))
def _describe(patches, angles, pattern, n_pairs: int):
    n, p, _ = patches.shape
    c = p // 2
    cos_t = jnp.cos(angles)[:, None]    # (N,1)
    sin_t = jnp.sin(angles)[:, None]
    # pattern: (B,2,2) -> rotate both sample points of every pair.
    px = pattern[None, :, :, 0]         # (1,B,2)
    py = pattern[None, :, :, 1]
    rx = cos_t[..., None] * px - sin_t[..., None] * py   # (N,B,2)
    ry = sin_t[..., None] * px + cos_t[..., None] * py
    ix = jnp.clip(jnp.round(rx).astype(jnp.int32) + c, 0, p - 1)
    iy = jnp.clip(jnp.round(ry).astype(jnp.int32) + c, 0, p - 1)
    rows = jnp.arange(n)[:, None]
    a = patches[rows, iy[..., 0], ix[..., 0]]            # (N,B)
    b = patches[rows, iy[..., 1], ix[..., 1]]
    bits = (a < b).astype(jnp.uint8)                     # (N,B)
    # Pack 8 bits/byte, LSB-first.
    bits = bits.reshape(n, n_pairs // 8, 8)
    weights = (1 << jnp.arange(8, dtype=jnp.uint32)).astype(jnp.uint8)
    return jnp.sum(bits * weights[None, None, :], axis=-1,
                   dtype=jnp.uint8)                      # (N, n_pairs//8)


def describe(img_blurred, xy, angles, pattern):
    """Steered rBRIEF. img must already be blurred.

    Args:
      xy: (N,2) keypoint coords; angles: (N,); pattern: (B,2,2).
    Returns:
      (N, B//8) uint8 packed descriptors.
    """
    n_pairs = pattern.shape[0]
    patch = 2 * int(np.ceil(np.abs(np.asarray(pattern)).max() * 1.5)) + 3
    patch = max(patch, 33)
    patches = extract_patches(img_blurred, xy, patch)
    return _describe(patches, angles, jnp.asarray(pattern), n_pairs)


def unpack_bits_pm1(desc_packed):
    """(N, B/8) uint8 -> (N, B) int8 in {-1,+1} for MXU matching."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (desc_packed[..., :, None] >> shifts[None, None, :]) & 1
    n = desc_packed.shape[0]
    bits = bits.reshape(n, -1).astype(jnp.int8)
    return bits * 2 - 1
