"""Core fixed-capacity pytree containers.

The reference passes ragged Python lists of cv2.KeyPoint between stages;
here every stage exchanges fixed-capacity arrays with validity masks
(XLA static shapes, SURVEY.md §7 design stance).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Features(NamedTuple):
    """Keypoints + descriptors for one image. Capacity N = cfg.detector.max_kp."""
    xy: jnp.ndarray      # (N,2) float32 pixel coords (x, y)
    score: jnp.ndarray   # (N,)  float32 FAST corner score
    angle: jnp.ndarray   # (N,)  float32 orientation, radians
    desc: jnp.ndarray    # (N,32) uint8 packed 256-bit rBRIEF
    mask: jnp.ndarray    # (N,)  bool validity

    @property
    def capacity(self) -> int:
        return self.xy.shape[-2]


class Matches(NamedTuple):
    """Row i of A matched to `idx[i]` of B where `mask[i]`."""
    idx: jnp.ndarray       # (N,) int32 index into B
    distance: jnp.ndarray  # (N,) int32 Hamming distance
    mask: jnp.ndarray      # (N,) bool


class StereoObservations(NamedTuple):
    """Per-frame output of the stereo frontend: matched L/R keypoints
    with triangulated camera-frame 3D points."""
    uv_l: jnp.ndarray    # (N,2)
    uv_r: jnp.ndarray    # (N,2)
    xyz: jnp.ndarray     # (N,3) left-camera frame
    desc: jnp.ndarray    # (N,32) uint8 (left descriptors)
    mask: jnp.ndarray    # (N,)
    score: jnp.ndarray   # (N,) FAST corner score of the left keypoint —
                         # keyframe snapshots keep the top-K by THIS, so
                         # loop verification matches against the
                         # strongest corners, not an arbitrary subset
