"""Pallas TPU kernels for the hot frontend ops.

Two kernels, each with a jnp fallback elsewhere in ops/:

  - `hamming_top2`: fused brute-force Hamming matching. One int8 MXU
    contraction per row tile produces the (TN, M) distance tile in VMEM
    and reduces it to row-wise (best, second-best, argbest) plus a
    running column-wise argmin (for cross-checking) WITHOUT ever
    writing the N x M distance matrix to HBM, and without XLA's
    sort-based lax.top_k. Replaces the reference's FLANN-LSH knn
    (/root/reference/keypoint.py:44, Point3D.py:33-53) — on the MXU the
    exhaustive product is cheaper than approximate hashing.

  - `fast_score`: FAST-9 corner score map. The jnp version
    (ops/fast.py) materializes 16 rolled copies of the image; here each
    row strip is loaded into VMEM once (with a 3-px halo) and the
    16-tap circular-arc predicate is evaluated by run-length counting
    over 16+9 sequential taps — one HBM read + one write per pixel,
    pure VPU work. Replaces cv2.FAST (/root/reference/orb.py:28-38,
    visual_odometry.py:86-96).

Both are bit-exact against their jnp references (tests/test_pallas.py)
and are selected automatically on TPU backends (ops/dispatch helpers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slam1_tpu.ops.fast import BORDER, CIRCLE

_BIG = 1 << 20  # plain int: pallas kernels cannot capture array constants


# ---------------------------------------------------------------------------
# Fused Hamming top-2 matcher
# ---------------------------------------------------------------------------

def _hamming_kernel(bits, dy_tol, dx_lo, dx_hi, a_ref, b_ref, ma_ref,
                    mb_ref, pya_ref, pxa_ref, yb_ref, xb_ref, d1_ref,
                    d2_ref, idx_ref, cmin_ref, carg_ref):
    i = pl.program_id(0)
    tn = a_ref.shape[0]
    # (TN, M) similarity on the MXU; d = (bits - sim) / 2. Descriptors
    # are {-1,+1} in bf16 (Mosaic has no int8 matmul path): products are
    # exact and |sim| <= bits < 2^24, so the f32 accumulation is exact.
    # B arrives pre-transposed (bits, M): Mosaic only lowers the
    # standard (m,k)@(k,n) contraction.
    # Explicit DEFAULT precision: the framework pins the global default
    # to "highest" (runtime.py), which Mosaic rejects for bf16 operands.
    sim = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)
    d = (bits - sim) * 0.5
    d = jnp.where(mb_ref[:] > 0, d, float(_BIG))           # (1,M) broadcast
    d = jnp.where(ma_ref[0][:, None] > 0, d, float(_BIG))  # invalid A rows
    if dy_tol is not None:
        # Fused geometric gate (epipolar band / prediction window):
        # candidates outside it never reach the top-2 — elementwise VPU
        # work on the tile already in VMEM, so gated matching costs the
        # same as plain matching (the jnp fallback materializes three
        # extra (N,M) arrays in HBM).
        dyv = jnp.abs(yb_ref[0][None, :] - pya_ref[0][:, None])
        dxv = pxa_ref[0][:, None] - xb_ref[0][None, :]
        bad = (dyv > dy_tol) | (dxv < dx_lo) | (dxv > dx_hi)
        d = jnp.where(bad, float(_BIG), d)

    # Row-wise best / second-best / argbest (Mosaic argmin needs f32).
    d1 = jnp.min(d, axis=1)
    idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d2 = jnp.min(jnp.where(cols == idx[:, None], float(_BIG), d), axis=1)
    d1_ref[0, :] = d1.astype(jnp.int32)
    d2_ref[0, :] = d2.astype(jnp.int32)
    idx_ref[0, :] = idx

    # Column-wise running argmin across row tiles (sequential grid).
    cmin_t = jnp.min(d, axis=0).astype(jnp.int32)   # (M,)
    carg_t = jnp.argmin(d, axis=0).astype(jnp.int32) + i * tn

    @pl.when(i == 0)
    def _():
        cmin_ref[0, :] = cmin_t
        carg_ref[0, :] = carg_t

    @pl.when(i > 0)
    def _():
        prev = cmin_ref[0, :]
        take = cmin_t < prev
        cmin_ref[0, :] = jnp.where(take, cmin_t, prev)
        carg_ref[0, :] = jnp.where(take, carg_t, carg_ref[0, :])


@functools.partial(jax.jit, static_argnames=("interpret", "dy_tol",
                                             "dx_lo", "dx_hi"))
def hamming_top2(a_pm1, b_pm1, mask_a, mask_b, *, uv_a=None, uv_b=None,
                 dy_tol=None, dx_lo=0.0, dx_hi=0.0,
                 interpret: bool = False):
    """Fused Hamming top-2, optionally with a fused geometric gate.

    Args:
      a_pm1: (N, B) int8 descriptors unpacked to {-1,+1}; N % 128 == 0.
      b_pm1: (M, B) int8; M % 128 == 0.
      mask_a: (N,) bool — invalid rows get sentinel distance.
      mask_b: (M,) bool — invalid columns get sentinel distance.
      uv_a/uv_b: optional (N,2)/(M,2) float coords — for row a, column
        b is eligible only if |y_b - y_a| <= dy_tol and
        dx_lo <= x_a - x_b <= dx_hi (the epipolar band with uv_a = A's
        positions; a prediction window with uv_a = predicted positions
        and dx_lo = -dx_hi = -radius). dy_tol/dx_lo/dx_hi are STATIC.
    Returns:
      d1 (N,), d2 (N,), idx (N,) int32 row-wise best/second/argbest and
      col_best (M,) int32 column-wise argmin (for cross-checking, gated
      by the same geometry).
    """
    n, bits = a_pm1.shape
    m = b_pm1.shape[0]
    tn = 128
    assert n % tn == 0 and m % 128 == 0, (n, m)
    assert (uv_a is None) == (dy_tol is None)
    grid = n // tn
    a_pm1 = a_pm1.astype(jnp.bfloat16)   # ±1: exact; Mosaic lacks int8 mmul
    b_t = b_pm1.astype(jnp.bfloat16).T   # (bits, M) for the (m,k)@(k,n) MXU
    if uv_a is None:
        pya = pxa = jnp.zeros((1, n), jnp.float32)
        yb = xb = jnp.zeros((1, m), jnp.float32)
        gate = (None, 0.0, 0.0)
    else:
        pya = uv_a[:, 1].astype(jnp.float32).reshape(1, n)
        pxa = uv_a[:, 0].astype(jnp.float32).reshape(1, n)
        yb = uv_b[:, 1].astype(jnp.float32).reshape(1, m)
        xb = uv_b[:, 0].astype(jnp.float32).reshape(1, m)
        gate = (float(dy_tol), float(dx_lo), float(dx_hi))

    d1, d2, idx, _, carg = pl.pallas_call(
        functools.partial(_hamming_kernel, int(bits), *gate),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tn, bits), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bits, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # Row-wise outputs live in one (1, N) row so every block
            # shape is (1, tn) with the leading dim equal to the full
            # array dim (Mosaic requires the last two block dims to be
            # (8,128)-divisible or equal to the array's).
            pl.BlockSpec((1, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((1, m), jnp.int32),
            jax.ShapeDtypeStruct((1, m), jnp.int32),
        ],
        interpret=interpret,
    )(a_pm1, b_t, mask_a.astype(jnp.int32).reshape(1, n),
      mask_b.astype(jnp.int32).reshape(1, m), pya, pxa, yb, xb)
    return (d1.reshape(n), d2.reshape(n), idx.reshape(n), carg.reshape(m))


# ---------------------------------------------------------------------------
# FAST-9 score map
# ---------------------------------------------------------------------------

def _fast_kernel(threshold, arc, h_pad, a_ref, o_ref):
    """One (halo_strip, W) -> (strip, W) FAST score tile.

    Run-length counting around the circle: taps are visited in circular
    order for 16 + (arc-1) steps; a pixel is a corner if any window of
    `arc` consecutive taps is all-bright (or all-dark). Score = sum of
    |diff|-threshold over each polarity (OpenCV's ranking variant),
    matching ops/fast.fast_score bit-for-bit.
    """
    _, th, w = o_ref.shape
    a = a_ref[0]
    c = a[BORDER:BORDER + th, :]                        # strip centers
    run_b = jnp.zeros((th, w), jnp.int32)
    run_d = jnp.zeros((th, w), jnp.int32)
    corner = jnp.zeros((th, w), jnp.bool_)
    score_b = jnp.zeros((th, w), jnp.float32)
    score_d = jnp.zeros((th, w), jnp.float32)

    n_taps = len(CIRCLE) + arc - 1
    for t in range(n_taps):
        dy, dx = CIRCLE[t % len(CIRCLE)]
        # Shifted tap view; x wraps via roll (border masked outside).
        rows = a[BORDER + dy:BORDER + dy + th, :]
        tap = jnp.roll(rows, -dx, axis=1) if dx else rows
        diff = tap - c
        bright = diff > threshold
        dark = diff < -threshold
        run_b = jnp.where(bright, run_b + 1, 0)
        run_d = jnp.where(dark, run_d + 1, 0)
        corner = corner | (run_b >= arc) | (run_d >= arc)
        if t < len(CIRCLE):
            score_b += jnp.maximum(diff - threshold, 0.0)
            score_d += jnp.maximum(-diff - threshold, 0.0)

    score = jnp.maximum(score_b, score_d)
    score = jnp.where(corner, score, 0.0)
    # Border suppression (x only; y handled by halo/global masking).
    i = pl.program_id(0)
    ys = jax.lax.broadcasted_iota(jnp.int32, (th, w), 0) + i * th
    xs = jax.lax.broadcasted_iota(jnp.int32, (th, w), 1)
    inside = ((ys >= BORDER) & (ys < h_pad - BORDER)
              & (xs >= BORDER) & (xs < w - BORDER))
    o_ref[0, :, :] = jnp.where(inside, score, 0.0)


@functools.partial(jax.jit, static_argnames=("threshold", "arc", "strip",
                                             "interpret"))
def fast_score(img, threshold: float, arc: int = 9, strip: int = 48,
               interpret: bool = False):
    """FAST corner score map via the strip-blocked Pallas kernel.

    Same contract as ops.fast.fast_score: (H,W) float32 -> (H,W) score.
    """
    h, w = img.shape
    n_strips = -(-h // strip)
    h_pad = n_strips * strip
    # Pad bottom to a strip multiple plus a halo ring top+bottom. Scores
    # in padding are killed by the `inside` mask (h passed via h_pad of
    # the REAL image extent below).
    img_p = jnp.pad(img, ((BORDER, BORDER + h_pad - h), (0, 0)))

    # Build overlapping halo strips (n, strip + 2*BORDER, W) by gather.
    starts = jnp.arange(n_strips) * strip
    offs = jnp.arange(strip + 2 * BORDER)
    rows = starts[:, None] + offs[None, :]
    strips = img_p[rows]                                # (n, strip+6, W)

    out = pl.pallas_call(
        functools.partial(_fast_kernel, float(threshold), arc, h),
        grid=(n_strips,),
        in_specs=[pl.BlockSpec((1, strip + 2 * BORDER, w),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, strip, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_strips, strip, w), jnp.float32),
        interpret=interpret,
    )(strips)
    return out.reshape(h_pad, w)[:h]
