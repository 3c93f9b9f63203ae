"""FAST-9 corner scoring, fully vectorized over the image.

TPU-native replacement for cv2.ORB's FAST stage and cv2.FastFeature
(reference /root/reference/orb.py:28-38, visual_odometry.py:86-96).
Instead of a per-pixel branchy scan, the 16 Bresenham-circle taps are
materialized as 16 shifted views and the "contiguous arc >= 9" predicate
is evaluated with log-step circular run-length doubling — pure
elementwise VPU work that XLA fuses into a handful of passes.

A Pallas kernel variant lives in ops/pallas_kernels.py; this module is
the reference implementation and CPU/test path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3, 16 taps in circular order: (dy, dx).
CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)
BORDER = 3


def _circle_stack(img):
    """(H,W) -> (16,H,W) of circle-tap values (roll wraps; border masked
    downstream)."""
    return jnp.stack(
        [jnp.roll(img, (-dy, -dx), axis=(0, 1)) for dy, dx in CIRCLE], axis=0)


def _runs_at_least(x, n):
    """x: (16,...) bool ring along axis 0. Returns mask of positions that
    start a circular run of >= n consecutive True, via doubling."""
    run = x
    length = 1
    bit = 1
    target = n
    # Compose shifts to cover exactly n using binary decomposition.
    # run_k[i] == all(x[i..i+k-1]); combine: run_{a+b}[i] = run_a[i] & run_b[i+a].
    result = None
    acc = None
    acc_len = 0
    while target > 0:
        if target & 1:
            if acc is None:
                acc, acc_len = run, length
            else:
                acc = acc & jnp.roll(run, -acc_len, axis=0)
                acc_len += length
        target >>= 1
        if target:
            run = run & jnp.roll(run, -length, axis=0)
            length *= 2
    return acc


@functools.partial(jax.jit, static_argnames=("arc",))
def fast_score(img, threshold, arc: int = 9):
    """FAST corner score map.

    Args:
      img: (H,W) float32 grayscale.
      threshold: intensity delta for brighter/darker classification.
      arc: required contiguous arc length (9 = FAST-9).
    Returns:
      (H,W) float32 score map; 0 at non-corners. Score is the sum of
      above-threshold absolute differences over the dominant polarity
      (OpenCV's FAST score variant, good for NMS ranking).
    """
    taps = _circle_stack(img)              # (16,H,W)
    diff = taps - img[None]
    bright = diff > threshold
    dark = diff < -threshold
    is_corner = (jnp.any(_runs_at_least(bright, arc), axis=0)
                 | jnp.any(_runs_at_least(dark, arc), axis=0))
    score_b = jnp.sum(jnp.maximum(diff - threshold, 0.0), axis=0)
    score_d = jnp.sum(jnp.maximum(-diff - threshold, 0.0), axis=0)
    score = jnp.maximum(score_b, score_d)
    score = jnp.where(is_corner, score, 0.0)
    # Kill the wrap-around border introduced by roll.
    h, w = img.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inside = ((ys >= BORDER) & (ys < h - BORDER)
              & (xs >= BORDER) & (xs < w - BORDER))
    return jnp.where(inside, score, 0.0)


def nms(score, radius: int = 2):
    """Local-maximum suppression: keep pixels equal to the window max."""
    k = 2 * radius + 1
    neigh = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME")
    return jnp.where((score >= neigh) & (score > 0.0), score, 0.0)
