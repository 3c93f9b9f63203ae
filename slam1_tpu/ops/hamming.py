"""Brute-force Hamming descriptor matching as an MXU contraction.

Replaces FLANN-LSH knn matching (/root/reference/keypoint.py:44,
tracking.py:12-34, Point3D.py:33-53). The TPU formulation: descriptors
unpacked to {-1,+1}^256 int8 give

    dot(a, b) = B - 2 * hamming(a, b)

so the full N x M distance matrix is ONE int8 matmul on the MXU followed
by an affine rescale — brute force beats approximate LSH here because
the systolic array makes the exhaustive product essentially free at
SLAM problem sizes (2k x 2k x 256 int8 MACs ≈ 1 GMAC).

A fused Pallas variant (matmul + top-2 in VMEM, never materializing the
distance matrix in HBM) lives in ops/pallas_kernels.py and is selected
automatically on TPU backends.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from slam1_tpu.ops.brief import unpack_bits_pm1
from slam1_tpu.ops.dispatch import use_pallas as _use_pallas
from slam1_tpu.types import Matches

_BIG = jnp.int32(1 << 20)


def distance_matrix(desc_a, desc_b, mask_a=None, mask_b=None):
    """Packed uint8 descriptors -> (N,M) int32 Hamming distances.

    Invalid rows/columns get a large sentinel distance.
    """
    bits = desc_a.shape[-1] * 8
    a = unpack_bits_pm1(desc_a)
    b = unpack_bits_pm1(desc_b)
    sim = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)          # (N,M)
    d = (bits - sim) // 2
    if mask_a is not None:
        d = jnp.where(mask_a[:, None], d, _BIG)
    if mask_b is not None:
        d = jnp.where(mask_b[None, :], d, _BIG)
    return d


def match(desc_a, desc_b, mask_a=None, mask_b=None, *, ratio=0.8,
          max_distance=64, cross_check=True) -> Matches:
    """Best-match with Lowe ratio test and optional mutual consistency.

    Mirrors the reference's knn(k=2) + 0.7-ratio filter
    (keypoint.py:44-51) plus an absolute distance gate.
    """
    n, m = desc_a.shape[0], desc_b.shape[0]
    if _use_pallas() and n % 128 == 0 and m % 128 == 0:
        from slam1_tpu.ops.pallas_kernels import hamming_top2
        ma = (jnp.ones((n,), bool) if mask_a is None else mask_a)
        mb = (jnp.ones((m,), bool) if mask_b is None else mask_b)
        d1, d2, best, col_best = hamming_top2(
            unpack_bits_pm1(desc_a), unpack_bits_pm1(desc_b), ma, mb)
    else:
        d = distance_matrix(desc_a, desc_b, mask_a, mask_b)
        # Two smallest distances per row == two largest of -d.
        neg_top2, idx_top2 = jax.lax.top_k(-d, 2)
        d1, d2 = -neg_top2[:, 0], -neg_top2[:, 1]
        best = idx_top2[:, 0]
        col_best = jnp.argmin(d, axis=0)           # (M,)
    ok = (d1 <= max_distance) & (d1.astype(jnp.float32)
                                 < ratio * d2.astype(jnp.float32))
    if cross_check:
        ok = ok & (col_best[best] == jnp.arange(n))
    if mask_a is not None:
        ok = ok & mask_a
    return Matches(idx=best, distance=d1, mask=ok)


def match_epipolar(desc_a, desc_b, xy_a, xy_b, mask_a, mask_b, *,
                   ratio=0.8, max_distance=64, dy_tol=2.0,
                   min_disparity=0.25, max_disparity=96.0,
                   cross_check=True) -> Matches:
    """Rectified-stereo matching: the epipolar band (|dy| <= dy_tol,
    disparity in [min, max]) is applied to the distance matrix BEFORE
    best/second-best selection.

    Gating candidates first changes what the Lowe ratio test measures:
    the second-best then comes from the ~10 candidates geometrically
    able to correspond, not from the whole frame — on self-similar
    imagery the global second-best is routinely a lookalike elsewhere
    in the image and the ratio test throws away the majority of true
    stereo pairs (measured: 133 within-distance-gate matches reduced to
    56 by the global ratio test on a 192-feature frame). This is the
    brute-force MXU analogue of classical scanline stereo matching; the
    reference's FLANN+LMedS pipeline (keypoint.py:35-66) filters AFTER
    matching and pays the same recall cost.
    """
    n, m_ = desc_a.shape[0], desc_b.shape[0]
    if _use_pallas() and n % 128 == 0 and m_ % 128 == 0:
        from slam1_tpu.ops.pallas_kernels import hamming_top2
        ma = (jnp.ones((n,), bool) if mask_a is None else mask_a)
        mb = (jnp.ones((m_,), bool) if mask_b is None else mask_b)
        d1, d2, best, col_best = hamming_top2(
            unpack_bits_pm1(desc_a), unpack_bits_pm1(desc_b), ma, mb,
            uv_a=xy_a, uv_b=xy_b, dy_tol=float(dy_tol),
            dx_lo=float(min_disparity), dx_hi=float(max_disparity))
        ok = (d1 <= max_distance) & (d1.astype(jnp.float32)
                                     < ratio * d2.astype(jnp.float32))
        if cross_check:
            ok = ok & (col_best[best] == jnp.arange(n))
        if mask_a is not None:
            ok = ok & mask_a
        return Matches(idx=best, distance=d1, mask=ok)
    d = distance_matrix(desc_a, desc_b, mask_a, mask_b)
    dy = jnp.abs(xy_a[:, 1:2] - xy_b[None, :, 1])
    disp = xy_a[:, 0:1] - xy_b[None, :, 0]
    off_band = ((dy > dy_tol) | (disp < min_disparity)
                | (disp > max_disparity))
    d = jnp.where(off_band, _BIG, d)
    neg_top2, idx_top2 = jax.lax.top_k(-d, 2)
    d1, d2 = -neg_top2[:, 0], -neg_top2[:, 1]
    best = idx_top2[:, 0]
    ok = (d1 <= max_distance) & (d1.astype(jnp.float32)
                                 < ratio * d2.astype(jnp.float32))
    if cross_check:
        col_best = jnp.argmin(d, axis=0)
        ok = ok & (col_best[best] == jnp.arange(n))
    if mask_a is not None:
        ok = ok & mask_a
    return Matches(idx=best, distance=d1, mask=ok)


def match_windowed(desc_a, desc_b, uv_pred_a, xy_b, mask_a, mask_b, *,
                   radius, ratio=0.8, max_distance=64,
                   cross_check=True) -> Matches:
    """Prediction-gated matching: B candidates outside a `radius`-px
    window around each A row's PREDICTED position are masked out of the
    distance matrix before best/second-best selection — the temporal
    analogue of match_epipolar's band (the ratio test then compares
    against candidates the motion model considers reachable, not the
    whole frame's lookalikes). The gate is an axis-aligned square (the
    fused Pallas kernel's band form); the jnp fallback matches it."""
    n = desc_a.shape[0]
    m_ = desc_b.shape[0]
    if _use_pallas() and n % 128 == 0 and m_ % 128 == 0:
        from slam1_tpu.ops.pallas_kernels import hamming_top2
        ma = (jnp.ones((n,), bool) if mask_a is None else mask_a)
        mb = (jnp.ones((m_,), bool) if mask_b is None else mask_b)
        d1, dd2, best, col_best = hamming_top2(
            unpack_bits_pm1(desc_a), unpack_bits_pm1(desc_b), ma, mb,
            uv_a=uv_pred_a, uv_b=xy_b, dy_tol=float(radius),
            dx_lo=-float(radius), dx_hi=float(radius))
        ok = (d1 <= max_distance) & (d1.astype(jnp.float32)
                                     < ratio * dd2.astype(jnp.float32))
        if cross_check:
            ok = ok & (col_best[best] == jnp.arange(n))
        if mask_a is not None:
            ok = ok & mask_a
        return Matches(idx=best, distance=d1, mask=ok)
    d = distance_matrix(desc_a, desc_b, mask_a, mask_b)
    dy = jnp.abs(uv_pred_a[:, 1:2] - xy_b[None, :, 1])
    dx = uv_pred_a[:, 0:1] - xy_b[None, :, 0]
    d = jnp.where((dy > radius) | (jnp.abs(dx) > radius), _BIG, d)
    neg_top2, idx_top2 = jax.lax.top_k(-d, 2)
    d1, dd2 = -neg_top2[:, 0], -neg_top2[:, 1]
    best = idx_top2[:, 0]
    ok = (d1 <= max_distance) & (d1.astype(jnp.float32)
                                 < ratio * dd2.astype(jnp.float32))
    if cross_check:
        col_best = jnp.argmin(d, axis=0)
        ok = ok & (col_best[best] == jnp.arange(n))
    if mask_a is not None:
        ok = ok & mask_a
    return Matches(idx=best, distance=d1, mask=ok)


def gather_matches(values_b, matches: Matches, fill=0.0):
    """Gather per-match rows of `values_b` aligned to A's index space."""
    out = values_b[matches.idx]
    return jnp.where(
        matches.mask.reshape((-1,) + (1,) * (out.ndim - 1)), out, fill)
