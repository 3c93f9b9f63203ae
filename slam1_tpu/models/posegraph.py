"""Pose-graph optimization with loop-closure constraints.

The real version of what the reference approximates twice:

  - its "active backend" pose-only BA with motion priors and a
    loop-endpoint constraint (/root/reference/BundleAdjustment.py:107-183)
  - its translation-only linear error smear after a loop closure
    (loop_closure.py:39-52) — the degenerate special case of one GN
    step on a chain graph.

TPU design: all edges evaluated in one vmap (residual = SE(3) log of
the cycle error, Jacobians by jacfwd at the identity perturbation), the
Gauss-Newton normal equations solved matrix-free with CG where each
matvec is gather -> per-edge 6x6 block products -> segment-sum. Static
shapes: edge arrays are fixed capacity with weight masks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam1_tpu.config import BAConfig
from slam1_tpu.ops import se3
from slam1_tpu.ops.cg import cg


class PoseGraph(NamedTuple):
    poses: jnp.ndarray    # (F,4,4) T_world_frame
    ei: jnp.ndarray       # (E,) int32 edge source
    ej: jnp.ndarray       # (E,) int32 edge target
    z: jnp.ndarray        # (E,4,4) measured T_i_j = inv(T_i) @ T_j
    w: jnp.ndarray        # (E,) float32 edge weight (0 = disabled)


def odometry_edges(poses, rel_twists, mask):
    """Chain edges from per-frame relative twists (i -> i+1)."""
    f = poses.shape[0]
    ei = jnp.arange(f - 1, dtype=jnp.int32)
    ej = ei + 1
    z = se3.exp_se3(rel_twists)
    return ei, ej, z, mask.astype(jnp.float32)


def _edge_residual(delta_i, delta_j, T_i, T_j, Z):
    Ti = T_i @ se3.exp_se3(delta_i)
    Tj = T_j @ se3.exp_se3(delta_j)
    return se3.log_se3(se3.inverse(Z) @ (se3.inverse(Ti) @ Tj))


@functools.partial(jax.jit, static_argnames=("iters", "cg_iters"))
def optimize(graph: PoseGraph, iters: int = 10, cg_iters: int = 50,
             damping: float = 1e-4):
    """Gauss-Newton pose-graph relaxation. Pose 0 is gauge-fixed.

    Returns (optimized poses (F,4,4), final weighted cost ()).
    """
    f = graph.poses.shape[0]

    def gn_step(poses, _):
        T_i = poses[graph.ei]
        T_j = poses[graph.ej]
        zero = jnp.zeros((graph.ei.shape[0], 6), poses.dtype)

        r0 = jax.vmap(_edge_residual)(zero, zero, T_i, T_j, graph.z)  # (E,6)
        Ji = jax.vmap(jax.jacfwd(_edge_residual, argnums=0))(
            zero, zero, T_i, T_j, graph.z)                            # (E,6,6)
        Jj = jax.vmap(jax.jacfwd(_edge_residual, argnums=1))(
            zero, zero, T_i, T_j, graph.z)

        w = graph.w[:, None]

        def scatter(vals_i, vals_j):
            out = jnp.zeros((f, 6), poses.dtype)
            out = out.at[graph.ei].add(vals_i)
            out = out.at[graph.ej].add(vals_j)
            return out

        b = -scatter(jnp.einsum("eab,ea->eb", Ji, r0 * w),
                     jnp.einsum("eab,ea->eb", Jj, r0 * w))

        def matvec(x):
            xi = x[graph.ei]
            xj = x[graph.ej]
            y = (jnp.einsum("eab,eb->ea", Ji, xi)
                 + jnp.einsum("eab,eb->ea", Jj, xj)) * w     # (E,6)
            out = scatter(jnp.einsum("eab,ea->eb", Ji, y),
                          jnp.einsum("eab,ea->eb", Jj, y))
            out = out + damping * x
            return out.at[0].set(x[0])       # gauge: pin pose 0

        b = b.at[0].set(0.0)
        delta = cg(matvec, b, iters=cg_iters)
        delta = delta.at[0].set(0.0)
        return poses @ se3.exp_se3(delta), None

    poses, _ = jax.lax.scan(gn_step, graph.poses, None, length=iters)

    T_i = poses[graph.ei]
    T_j = poses[graph.ej]
    zero = jnp.zeros((graph.ei.shape[0], 6), poses.dtype)
    r = jax.vmap(_edge_residual)(zero, zero, T_i, T_j, graph.z)
    cost = jnp.sum(graph.w * jnp.sum(r * r, axis=-1))
    return poses, cost


def distribute_error_linear(poses, idx, i, T_corrected):
    """Reference-parity fallback (loop_closure.py:48-52): linearly smear
    the translation error of frame i over frames idx..i. Kept for
    BASELINE GTvsPOSE-style comparison; `optimize` is the real fix."""
    err = T_corrected[:3, 3] - poses[i, :3, 3]
    f = poses.shape[0]
    t = jnp.arange(f, dtype=poses.dtype)
    frac = jnp.clip((t - idx) / jnp.maximum(i - idx, 1), 0.0, 1.0)
    frac = jnp.where(t > i, 1.0, frac)
    return poses.at[:, :3, 3].add(frac[:, None] * err[None, :])
