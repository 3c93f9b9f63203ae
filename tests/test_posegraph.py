import jax
import jax.numpy as jnp
import numpy as np

from slam1_tpu.models import posegraph
from slam1_tpu.ops import se3


def make_loop_problem(n=30, drift=0.02, seed=0):
    """Circular trajectory; odometry has systematic drift; one loop edge
    ties the last frame back to the first."""
    rng = np.random.default_rng(seed)
    yaw = 2 * np.pi / n
    xi_true = np.array([0.0, 0.0, 1.0, 0.0, yaw, 0.0], np.float32)
    T_true = [np.eye(4, dtype=np.float32)]
    for _ in range(n - 1):
        T_true.append(T_true[-1] @ np.asarray(se3.exp_se3(jnp.asarray(xi_true))))
    T_true = np.stack(T_true)

    # drifted odometry measurements
    xi_odo = np.tile(xi_true, (n - 1, 1))
    xi_odo[:, 2] += drift  # forward bias
    poses = [np.eye(4, dtype=np.float32)]
    for i in range(n - 1):
        poses.append(poses[-1] @ np.asarray(se3.exp_se3(jnp.asarray(xi_odo[i]))))
    poses = np.stack(poses)

    ei = np.arange(n - 1, dtype=np.int32)
    ej = ei + 1
    z = np.asarray(se3.exp_se3(jnp.asarray(xi_odo)))
    w = np.ones(n - 1, np.float32)
    # loop-closure edge: measured true relative pose between frame 0 and n-1
    z_loop = np.asarray(
        jnp.linalg.inv(jnp.asarray(T_true[0])) @ jnp.asarray(T_true[-1]))
    ei = np.concatenate([ei, [0]]).astype(np.int32)
    ej = np.concatenate([ej, [n - 1]]).astype(np.int32)
    z = np.concatenate([z, z_loop[None]])
    w = np.concatenate([w, [100.0]]).astype(np.float32)

    graph = posegraph.PoseGraph(
        poses=jnp.asarray(poses), ei=jnp.asarray(ei), ej=jnp.asarray(ej),
        z=jnp.asarray(z), w=jnp.asarray(w))
    return graph, T_true, poses


def test_pgo_reduces_loop_error():
    graph, T_true, poses_odo = make_loop_problem()
    opt, cost = posegraph.optimize(graph, iters=8, cg_iters=60)
    opt = np.asarray(opt)
    err_before = np.linalg.norm(poses_odo[-1, :3, 3] - T_true[-1, :3, 3])
    err_after = np.linalg.norm(opt[-1, :3, 3] - T_true[-1, :3, 3])
    assert err_after < err_before * 0.2, (err_before, err_after)
    # gauge: first pose untouched
    np.testing.assert_allclose(opt[0], np.eye(4), atol=1e-5)


def test_pgo_noop_on_consistent_graph():
    graph, T_true, _ = make_loop_problem(drift=0.0)
    opt, cost = posegraph.optimize(graph, iters=4, cg_iters=40)
    np.testing.assert_allclose(np.asarray(opt), np.asarray(graph.poses),
                               atol=1e-3)
    assert float(cost) < 1e-6


def test_pgo_ignores_zero_weight_edges():
    graph, T_true, poses_odo = make_loop_problem()
    # disable the loop edge -> nothing pulls the drift back
    w = np.asarray(graph.w).copy()
    w[-1] = 0.0
    g2 = graph._replace(w=jnp.asarray(w))
    opt, _ = posegraph.optimize(g2, iters=4, cg_iters=40)
    end_shift = np.linalg.norm(np.asarray(opt)[-1, :3, 3]
                               - poses_odo[-1, :3, 3])
    assert end_shift < 1e-2


def test_distribute_error_linear():
    poses = jnp.tile(jnp.eye(4), (10, 1, 1))
    T_corr = jnp.eye(4).at[:3, 3].set(jnp.array([1.0, 0.0, 0.0]))
    out = posegraph.distribute_error_linear(poses, 2, 8, T_corr)
    out = np.asarray(out)
    np.testing.assert_allclose(out[2, :3, 3], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[5, :3, 3], [0.5, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[8, :3, 3], [1.0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[9, :3, 3], [1.0, 0, 0], atol=1e-6)
