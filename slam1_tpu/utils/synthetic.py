"""Synthetic stereo-sequence generator with exact ground truth.

The reference is only runnable against a local KITTI download (hardcoded
path, /root/reference/main.py:34); this module provides a self-contained
substitute: a random textured 3D landmark field rendered into a rectified
stereo pair along a known trajectory. Used by tests (oracle: GT poses /
GT 3D points are exact) and by bench.py when no KITTI data is present.

Rendering is a fixed-shape scatter-add of per-landmark texture patches at
the projected pixel locations — fully jittable, so long benches can
render on-device.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from slam1_tpu.ops import se3
from slam1_tpu.ops.camera import StereoCamera, project_stereo


class SyntheticWorld(NamedTuple):
    points: jnp.ndarray    # (P,3)   world-frame landmarks
    patches: jnp.ndarray   # (P,ps,ps) texture stamped at each landmark
    poses: jnp.ndarray     # (F,4,4) GT world-from-camera (left) poses
    cam: StereoCamera


def make_trajectory(n_frames: int, kind: str = "arc",
                    speed: float = 1.0, dtype=jnp.float32) -> jnp.ndarray:
    """(F,4,4) world-from-camera poses. Camera looks along +z.

    kinds: 'straight' | 'arc' (gentle yaw) | 'loop' (returns near start)
    | 'loop2' (TWO laps of the same circle — the second lap continuously
    revisits the first, giving multiple independent loop-closure
    windows on one clip).
    """
    if kind == "straight":
        yaw_rate = 0.0
    elif kind == "arc":
        yaw_rate = 0.002
    elif kind == "loop":
        yaw_rate = 2.0 * np.pi / max(n_frames - 1, 1)
    elif kind == "loop2":
        yaw_rate = 4.0 * np.pi / max(n_frames - 1, 1)
    else:
        raise ValueError(f"unknown trajectory kind: {kind}")
    xi = jnp.tile(
        jnp.array([0.0, 0.0, speed, 0.0, yaw_rate, 0.0], dtype),
        (n_frames - 1, 1))
    step = se3.exp_se3(xi)  # (F-1,4,4)

    def scan_fn(T, dT):
        T2 = T @ dT
        return T2, T2

    T0 = jnp.eye(4, dtype=dtype)
    _, rest = jax.lax.scan(scan_fn, T0, step)
    return jnp.concatenate([T0[None], rest], axis=0)


def make_world(key, n_frames: int = 64, n_points: int = 4096,
               trajectory: str = "arc", speed: float = 1.0,
               cam: StereoCamera | None = None,
               image_hw: tuple | None = None,
               patch_size: int = 9, dtype=jnp.float32) -> SyntheticWorld:
    """image_hw: if given (and cam is not), the camera is rescaled to
    that canvas so rendered landmarks actually fall inside it."""
    if cam is None:
        cam = (StereoCamera.for_canvas(*image_hw, dtype) if image_hw
               else StereoCamera.kitti_default(dtype))
    poses = make_trajectory(n_frames, trajectory, speed, dtype)
    k1, k2, k3 = jax.random.split(key, 3)
    # Anchor each landmark to a random frame's frustum so the whole
    # trajectory stays covered.
    anchor = jax.random.randint(k1, (n_points,), 0, n_frames)
    local = jnp.stack([
        jax.random.uniform(k2, (n_points,), dtype, -18.0, 18.0),
        jax.random.uniform(jax.random.fold_in(k2, 1), (n_points,), dtype,
                           -4.0, 3.0),
        jax.random.uniform(jax.random.fold_in(k2, 2), (n_points,), dtype,
                           6.0, 55.0),
    ], axis=-1)
    T = poses[anchor]                                   # (P,4,4)
    pts = (T[:, :3, :3] @ local[..., None])[..., 0] + T[:, :3, 3]
    # High-contrast random texture per landmark; centre boosted so FAST
    # has a strong nucleus.
    patches = jax.random.uniform(k3, (n_points, patch_size, patch_size),
                                 dtype, 0.25, 1.0)
    c = patch_size // 2
    patches = patches.at[:, c, c].set(1.0)
    return SyntheticWorld(pts, patches, poses, cam)


@functools.partial(jax.jit, static_argnums=(2, 3))
def render_frame(world: SyntheticWorld, frame_idx, height: int, width: int):
    """Render the rectified stereo pair for one frame.

    Returns (left, right) float32 (H,W) images in [0,1].
    """
    T_wc = world.poses[frame_idx]
    X_cam = se3.transform_points(se3.inverse(T_wc), world.points)
    uv_l, uv_r, in_front = project_stereo(world.cam, X_cam)
    z = X_cam[..., 2]
    vis = in_front & (z > 2.0) & (z < 90.0)

    # Compact to the visible subset (static top-k budget): the splat
    # scatter costs ~20 ns/element on TPU, and a big world pays it for
    # EVERY point while only a few % are in the frustum of any one
    # frame. 6144 slots cover the densest frames with a wide margin;
    # truly hidden points carry vis=False and splat nothing either way.
    P = world.points.shape[0]
    K = min(P, 6144)
    patches = world.patches
    if K < P:
        _, sel = jax.lax.top_k(vis.astype(jnp.float32), K)
        uv_l = uv_l[sel]
        uv_r = uv_r[sel]
        vis = vis[sel]
        patches = world.patches[sel]

    ps = world.patches.shape[-1]
    r = ps // 2
    dy = jnp.arange(-r, r + 1)
    dx = jnp.arange(-r, r + 1)
    oy, ox = jnp.meshgrid(dy, dx, indexing="ij")   # (ps,ps)

    def splat(uv, valid):
        cx = jnp.round(uv[..., 0]).astype(jnp.int32)
        cy = jnp.round(uv[..., 1]).astype(jnp.int32)
        # Sub-pixel placement: sample each patch at the fractional
        # offset so the stamped texture moves smoothly with the true
        # projection (integer-only splatting quantizes disparity by
        # +-0.5 px, which at small focal lengths corrupts triangulation
        # depth by >10%).
        fx_ = uv[..., 0] - cx.astype(uv.dtype)      # in [-0.5, 0.5]
        fy_ = uv[..., 1] - cy.astype(uv.dtype)
        p = patches                                  # (K,ps,ps)
        pad = jnp.pad(p, ((0, 0), (1, 1), (1, 1)))
        base_y = (oy[None] + 1).astype(jnp.int32)    # (1,ps,ps)
        base_x = (ox[None] + 1).astype(jnp.int32)
        # shift by +f means sampling the patch at (y - fy, x - fx)
        pos_y = (fy_ >= 0)[:, None, None]
        pos_x = (fx_ >= 0)[:, None, None]
        y0 = base_y - jnp.where(pos_y, 1, 0)
        x0 = base_x - jnp.where(pos_x, 1, 0)
        wy = jnp.abs(fy_)[:, None, None]
        wx = jnp.abs(fx_)[:, None, None]
        rows = jnp.arange(p.shape[0])[:, None, None]
        v00 = pad[rows, y0, x0]
        v01 = pad[rows, y0, x0 + 1]
        v10 = pad[rows, y0 + 1, x0]
        v11 = pad[rows, y0 + 1, x0 + 1]
        wy0 = jnp.where(pos_y, wy, 1.0 - wy)
        wx0 = jnp.where(pos_x, wx, 1.0 - wx)
        vals = (v00 * wy0 * wx0 + v01 * wy0 * (1 - wx0)
                + v10 * (1 - wy0) * wx0 + v11 * (1 - wy0) * (1 - wx0))

        inb = valid & (cx >= r) & (cx < width - r) & (cy >= r) & (cy < height - r)
        yy = cy[:, None, None] + oy[None]
        xx = cx[:, None, None] + ox[None]
        vals = jnp.where(inb[:, None, None], vals, 0.0)
        yy = jnp.clip(yy, 0, height - 1)
        xx = jnp.clip(xx, 0, width - 1)
        img = jnp.zeros((height, width), world.points.dtype)
        # `max` rather than `add` so overlapping patches stay in [0,1]
        # and the texture is stable under partial occlusion.
        return img.at[yy, xx].max(vals)

    return splat(uv_l, vis), splat(uv_r, vis)


def render_sequence(world: SyntheticWorld, height: int, width: int,
                    batch_size: int = 8):
    """(F,H,W) left and right stacks (device arrays).

    Renders in `batch_size`-frame chunks (lax.map scans over chunks,
    vmapping within each): a flat vmap over all F frames materializes
    the (F, P, ps, ps) splat intermediates at once — ~30 GB for a
    300-frame / 12k-point world, beyond a v5e chip's 16 GB HBM.
    """
    f = lambda i: render_frame(world, i, height, width)
    return jax.lax.map(f, jnp.arange(world.poses.shape[0]),
                       batch_size=batch_size)
