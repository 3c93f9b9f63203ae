import jax.numpy as jnp
import numpy as np

from slam1_tpu.models import ref_backend
from slam1_tpu.ops import se3


def test_segment_ba_closes_endpoint_gap():
    """Drifted odometry over a segment; the endpoint constraint should
    pull the composed chain onto the measured loop transform."""
    s = 16
    xi_true = jnp.tile(jnp.asarray([0, 0, 1.0, 0, 0.05, 0], jnp.float32),
                       (s, 1))
    # true end transform
    T_end = ref_backend.recompose(jnp.eye(4), xi_true,
                                  jnp.ones(s, bool))[-1]
    # drifted odometry
    xi_odo = xi_true.at[:, 2].add(0.05).at[:, 4].add(0.002)
    valid = jnp.ones(s, bool)

    T_before = ref_backend.recompose(jnp.eye(4), xi_odo, valid)[-1]
    gap_before = float(jnp.linalg.norm(T_before[:3, 3] - T_end[:3, 3]))

    xi_opt, cost = ref_backend.optimize_segment(xi_odo, valid, T_end,
                                                iters=25)
    T_after = ref_backend.recompose(jnp.eye(4), xi_opt, valid)[-1]
    gap_after = float(jnp.linalg.norm(T_after[:3, 3] - T_end[:3, 3]))
    assert gap_after < gap_before * 0.2, (gap_before, gap_after)


def test_segment_ba_without_loop_is_identity_ish():
    """Without the loop term, the motion prior alone keeps the odometry
    (the reference's 'no loop' wrapper had a bug keeping loop terms —
    ours must not)."""
    s = 8
    xi = jnp.tile(jnp.asarray([0, 0, 1.0, 0, 0.01, 0], jnp.float32), (s, 1))
    out, cost = ref_backend.optimize_segment(
        xi, jnp.ones(s, bool), jnp.eye(4), iters=10, with_loop=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xi), atol=1e-4)
    assert float(cost) < 1e-6


def test_padding_rows_fixed():
    s = 8
    xi = jnp.tile(jnp.asarray([0, 0, 1.0, 0, 0, 0], jnp.float32), (s, 1))
    valid = jnp.asarray([True] * 5 + [False] * 3)
    T_end = ref_backend.recompose(jnp.eye(4), xi, valid)[-1]
    # ask for a big correction; padded rows must not move
    T_target = T_end.at[2, 3].add(1.0)
    out, _ = ref_backend.optimize_segment(xi, valid, T_target, iters=15)
    np.testing.assert_allclose(np.asarray(out[5:]), np.asarray(xi[5:]),
                               atol=1e-5)
