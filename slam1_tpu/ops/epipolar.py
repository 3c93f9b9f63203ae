"""Fundamental-matrix estimation: vmapped 8-point RANSAC.

General-geometry counterpart of cv2.findFundamentalMat(FM_LMEDS)
(/root/reference/keypoint.py:59-66). The rectified stereo frontend uses
the trivial row/disparity gate instead (models/frontend.py); this module
serves non-rectified pairs and temporal-pair outlier rejection.

TPU shape: K hypotheses solved in one vmap (normalized 8-point via SVD
of the 8x9 design matrix + rank-2 projection), scored by Sampson
distance over all correspondences, best-by-inlier-count — the same
fixed-size RANSAC pattern as ops/pnp.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class FMatResult(NamedTuple):
    F: jnp.ndarray        # (3,3)
    inliers: jnp.ndarray  # (N,)
    num_inliers: jnp.ndarray
    ok: jnp.ndarray


def _normalize(uv, mask):
    """Hartley normalization: zero-mean, sqrt(2) RMS (masked)."""
    w = mask.astype(uv.dtype)[:, None]
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(uv * w, axis=0) / n
    d = jnp.sqrt(jnp.sum(jnp.sum((uv - mean) ** 2 * w, axis=-1)) / n)
    s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-6)
    T = jnp.array([[s, 0, -s * mean[0]],
                   [0, s, -s * mean[1]],
                   [0, 0, 1.0]], uv.dtype)
    uvn = (uv - mean) * s
    return uvn, T


def _eight_point(uv1n, uv2n, T1, T2, w):
    """F from >=8 (weighted) normalized correspondences."""
    x1, y1 = uv1n[:, 0], uv1n[:, 1]
    x2, y2 = uv2n[:, 0], uv2n[:, 1]
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1,
                   jnp.ones_like(x1)], axis=-1) * w[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F = Vt[8].reshape(3, 3)
    # rank-2 projection
    U, S, Vt2 = jnp.linalg.svd(F)
    F = (U * S.at[2].set(0.0)[None, :]) @ Vt2
    F = T2.T @ F @ T1
    return F / (F[2, 2] + jnp.where(jnp.abs(F[2, 2]) < 1e-12, 1e-12, 0.0))


def sampson_distance(F, uv1, uv2):
    """(N,) first-order geometric error of x2^T F x1 = 0."""
    ones = jnp.ones_like(uv1[:, :1])
    x1 = jnp.concatenate([uv1, ones], axis=-1)
    x2 = jnp.concatenate([uv2, ones], axis=-1)
    Fx1 = x1 @ F.T          # (N,3)
    Ftx2 = x2 @ F           # (N,3)
    num = jnp.sum(x2 * Fx1, axis=-1) ** 2
    den = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


@functools.partial(jax.jit, static_argnames=("iters",))
def ransac_fundamental(key, uv1, uv2, mask, iters: int = 128,
                       px_thresh: float = 1.5,
                       min_inliers: int = 12) -> FMatResult:
    n = uv1.shape[0]
    uv1n, T1 = _normalize(uv1, mask)
    uv2n, T2 = _normalize(uv2, mask)

    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(key, (iters, n), minval=1e-9, maxval=1.0)))
    _, samples = jax.lax.top_k(jnp.where(mask[None, :], gumbel, -jnp.inf), 8)

    def solve_one(idx):
        return _eight_point(uv1n[idx], uv2n[idx], T1, T2,
                            mask[idx].astype(uv1.dtype))

    Fs = jax.vmap(solve_one)(samples)                          # (K,3,3)
    d = jax.vmap(lambda F: sampson_distance(F, uv1, uv2))(Fs)  # (K,N)
    t2 = px_thresh * px_thresh
    inl = (d < t2) & mask[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    # Final polish: 8-point on all inliers of the best model.
    w = inl[best].astype(uv1.dtype)
    F = _eight_point(uv1n, uv2n, T1, T2, w)
    d_f = sampson_distance(F, uv1, uv2)
    inliers = (d_f < t2) & mask
    num = jnp.sum(inliers)
    use_polished = num >= counts[best]
    F = jnp.where(use_polished, F, Fs[best])
    inliers = jnp.where(use_polished, inliers, inl[best])
    num = jnp.maximum(num, counts[best])
    return FMatResult(F=F, inliers=inliers, num_inliers=num,
                      ok=num >= min_inliers)
