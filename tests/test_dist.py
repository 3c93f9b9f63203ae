"""Multi-device tests on the 8-device virtual CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam1_tpu.config import BAConfig
from slam1_tpu.models.ba import BAProblem, bundle_adjust
from slam1_tpu.parallel.dist_ba import (distributed_bundle_adjust,
                                        partition_problem)
from slam1_tpu.parallel.mesh import make_mesh

from tests.test_ba import make_ba_problem, pose_err


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape["batch"] * mesh.shape["lm"] == 8
    mesh2 = make_mesh(8, lm_axis=2)
    assert mesh2.shape["lm"] == 2


def test_partition_problem_preserves_obs():
    prob, *_ = make_ba_problem(n_cams=4, n_pts=40)
    sp, orig = partition_problem(prob, 4)
    assert sp.points.shape[0] == 4
    # every original observation appears exactly once with weight 1
    total_w = float(np.asarray(sp.w).sum())
    assert total_w == float(np.asarray(prob.w).sum())
    # local landmark indices in range
    Lk = sp.points.shape[1]
    assert int(np.asarray(sp.lm_idx).max()) < Lk


def test_distributed_ba_matches_single_chip():
    prob, T_true, pts_true, cam = make_ba_problem(n_cams=5, n_pts=80,
                                                  px_noise=0.0)
    cfg = BAConfig(lm_iters=6, cg_iters=30)
    mesh = make_mesh(8, lm_axis=4)
    sp, orig = partition_problem(prob, 4)

    out_d, cost_d = distributed_bundle_adjust(sp, cam, cfg, mesh)
    out_s, cost_s = bundle_adjust(prob, cam, cfg)

    err_d = pose_err(out_d.poses, T_true)
    err_s = pose_err(out_s.poses, T_true)
    assert err_d < 1e-2, f"distributed BA did not converge: {err_d}"
    # distributed and single-chip should land on equivalent solutions
    assert abs(err_d - err_s) < 5e-3
    assert np.isfinite(float(cost_d))


def test_dp_frontend_sharded():
    """Data-parallel detection over the batch mesh axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from slam1_tpu.config import tiny_config
    from slam1_tpu.ops.detector import detect_batch

    cfg = tiny_config()
    mesh = make_mesh(8, lm_axis=1)   # all 8 devices on batch
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (8, 64, 128)) > 0.995,
                       jnp.float32)
    sharding = NamedSharding(mesh, P("batch", None, None))
    imgs = jax.device_put(imgs, sharding)
    feats = jax.jit(lambda im: detect_batch(im, cfg.detector))(imgs)
    assert feats.xy.shape[0] == 8
    jax.block_until_ready(feats.xy)


def test_graft_entry_contract():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    g.dryrun_multichip(8)


def test_partition_problem_device_matches_host():
    """The fully-vectorized device partitioner must reproduce the host
    oracle: same shard contents (as multisets of observations), same
    landmark blocks, zero drops at default capacity."""
    from slam1_tpu.parallel.dist_ba import partition_problem_device

    prob, *_ = make_ba_problem(n_cams=4, n_pts=40)
    n_shards = 4
    sp_h, orig_h = partition_problem(prob, n_shards)
    sp_d, orig_d, dropped = partition_problem_device(prob, n_shards)
    assert int(dropped) == 0
    np.testing.assert_array_equal(np.asarray(sp_d.points),
                                  np.asarray(sp_h.points))
    np.testing.assert_array_equal(np.asarray(orig_d)[
        :, :orig_h.shape[1]], np.asarray(orig_h))
    # Per-shard observation multisets agree (padding layouts may differ).
    for s in range(n_shards):
        def rows(sp):
            w = np.asarray(sp.w[s]) > 0
            r = np.stack([np.asarray(sp.cam_idx[s])[w],
                          np.asarray(sp.lm_idx[s])[w],
                          np.asarray(sp.uv[s])[w][:, 0],
                          np.asarray(sp.uv[s])[w][:, 1]], -1)
            return r[np.lexsort(r.T)]
        np.testing.assert_allclose(rows(sp_d), rows(sp_h))


def test_partition_problem_device_feeds_distributed_ba():
    """End-to-end: device partition -> distributed BA converges to the
    same solution as the host-partitioned path."""
    from slam1_tpu.parallel.dist_ba import partition_problem_device

    prob, T_true, pts_true, cam = make_ba_problem(n_cams=5, n_pts=80,
                                                  px_noise=0.0)
    cfg = BAConfig(lm_iters=6, cg_iters=30)
    mesh = make_mesh(8, lm_axis=4)
    sp_h, _ = partition_problem(prob, 4)
    sp_d, _, dropped = partition_problem_device(prob, 4)
    assert int(dropped) == 0
    # capacities may differ; pad host problem is the reference result
    out_h, cost_h = distributed_bundle_adjust(sp_h, cam, cfg, mesh)
    out_d, cost_d = distributed_bundle_adjust(sp_d, cam, cfg, mesh)
    np.testing.assert_allclose(np.asarray(out_d.poses),
                               np.asarray(out_h.poses), atol=1e-4)
    assert abs(float(cost_d) - float(cost_h)) < 1e-3 * max(
        1.0, float(cost_h))
