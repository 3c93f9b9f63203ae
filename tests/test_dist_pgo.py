"""Keyframe-axis sharded pose-graph GN vs the single-chip solver.

Runs on the virtual 8-device CPU mesh (conftest). The sharded solver
must reproduce models/posegraph.optimize to numerical tolerance: same
chain edges, same loop edges, same GN/CG iteration counts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam1_tpu.models import posegraph
from slam1_tpu.ops import se3
from slam1_tpu.parallel import dist_pgo, mesh as mesh_mod


def _noisy_chain(key, f, loop=True):
    """Ground-truth circle trajectory + drifty odometry measurements."""
    t = np.linspace(0, 2 * np.pi * (f - 1) / f, f)
    radius = 20.0
    gt = np.tile(np.eye(4, dtype=np.float32), (f, 1, 1))
    gt[:, 0, 3] = radius * np.sin(t)
    gt[:, 2, 3] = radius * (1 - np.cos(t))
    for k in range(f):
        c, s = np.cos(t[k]), np.sin(t[k])
        gt[k, :3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]],
                                 np.float32)
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 1 << 30)))
    z = np.zeros((f, 4, 4), np.float32)
    w = np.zeros((f,), np.float32)
    for k in range(f - 1):
        true_rel = np.linalg.inv(gt[k]) @ gt[k + 1]
        xi = np.asarray(se3.log_se3(jnp.asarray(true_rel)))
        xi = xi + rng.normal(0, 0.004, 6).astype(np.float32)
        z[k] = np.asarray(se3.exp_se3(jnp.asarray(xi)))
        w[k] = 1.0
    # integrate noisy odometry for the initial guess
    est = np.tile(np.eye(4, dtype=np.float32), (f, 1, 1))
    for k in range(f - 1):
        est[k + 1] = est[k] @ z[k]
    return gt, est, z, w


def test_sharded_pgo_matches_single_chip():
    f = 64
    gt, est, z, w = _noisy_chain(jax.random.PRNGKey(0), f)

    E = 4
    le_i = np.zeros(E, np.int32)
    le_j = np.zeros(E, np.int32)
    le_z = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))
    le_w = np.zeros(E, np.float32)
    # one true loop edge: frame 0 <-> frame f-1 with the GT relative pose
    le_i[0], le_j[0] = 0, f - 1
    le_z[0] = np.linalg.inv(gt[0]) @ gt[f - 1]
    le_w[0] = 5.0

    # Parity is checked AT THE GN FIXED POINT (30 iterations; at 8 both
    # solvers are still mid-convergence and their inexact steps differ).
    # The single-chip solver's chain preconditioner makes its CG exact
    # in ~O(loop edges) iterations; the sharded solver preconditions
    # per block and still needs ~O(F) for cross-boundary propagation —
    # so it gets a larger CG budget and both must land on the same
    # optimum. With cg=8f every sharded GN step is solved essentially
    # exactly, so the two solvers follow the SAME GN trajectory and
    # agree to mm (measured 1.2 mm); at smaller CG budgets they drift
    # along the problem's soft mode (a chain with one loop edge leaves
    # the circle's in-plane breathing weakly constrained - 0.28 m of
    # pose change buys only 6% cost there, so pose parity between
    # DIFFERENTLY-inexact solvers is not meaningful).
    iters = 30

    ei = jnp.arange(f - 1, dtype=jnp.int32)
    ref_graph = posegraph.PoseGraph(
        poses=jnp.asarray(est),
        ei=jnp.concatenate([ei, jnp.asarray(le_i)]),
        ej=jnp.concatenate([ei + 1, jnp.asarray(le_j)]),
        z=jnp.concatenate([jnp.asarray(z[:f - 1]), jnp.asarray(le_z)]),
        w=jnp.concatenate([jnp.asarray(w[:f - 1]), jnp.asarray(le_w)]))
    ref_poses, ref_cost = posegraph.optimize(ref_graph, iters=iters,
                                             cg_iters=48)

    m = mesh_mod.make_mesh(8, lm_axis=4)
    out_poses, out_cost = dist_pgo.optimize_sharded(
        jnp.asarray(est), jnp.asarray(z), jnp.asarray(w),
        jnp.asarray(le_i), jnp.asarray(le_j), jnp.asarray(le_z),
        jnp.asarray(le_w), mesh=m, axis="lm", iters=iters,
        cg_iters=8 * f)

    ref_np = np.asarray(ref_poses)
    out_np = np.asarray(out_poses)
    # translation parity (see tolerance note above)
    terr = np.abs(ref_np[:, :3, 3] - out_np[:, :3, 3]).max()
    assert terr < 1e-2, terr
    rerr = np.abs(ref_np[:, :3, :3] - out_np[:, :3, :3]).max()
    assert rerr < 5e-3, rerr
    assert abs(float(ref_cost) - float(out_cost)) < 5e-2 * max(
        1e-4, float(ref_cost))


def test_sharded_pgo_closes_loop():
    """The sharded solver must actually pull drift out, not just agree
    with the reference solver."""
    f = 64
    gt, est, z, w = _noisy_chain(jax.random.PRNGKey(3), f)
    E = 2
    le_i = np.array([0, 0], np.int32)
    le_j = np.array([f - 1, 0], np.int32)
    le_z = np.stack([np.linalg.inv(gt[0]) @ gt[f - 1],
                     np.eye(4, dtype=np.float32)])
    le_w = np.array([10.0, 0.0], np.float32)

    m = mesh_mod.make_mesh(8, lm_axis=4)
    out_poses, _ = dist_pgo.optimize_sharded(
        jnp.asarray(est), jnp.asarray(z), jnp.asarray(w),
        jnp.asarray(le_i), jnp.asarray(le_j), jnp.asarray(le_z),
        jnp.asarray(le_w), mesh=m, axis="lm", iters=10, cg_iters=48)

    end_err_before = np.linalg.norm(est[f - 1, :3, 3] - gt[f - 1, :3, 3])
    end_err_after = np.linalg.norm(
        np.asarray(out_poses)[f - 1, :3, 3] - gt[f - 1, :3, 3])
    assert end_err_after < end_err_before
