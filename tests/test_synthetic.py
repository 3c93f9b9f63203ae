import jax
import jax.numpy as jnp
import numpy as np

from slam1_tpu.ops import se3
from slam1_tpu.ops.camera import project_stereo
from slam1_tpu.ops.triangulate import stereo_rectified
from slam1_tpu.utils.synthetic import (make_trajectory, make_world,
                                       render_frame)


def test_trajectory_shapes_and_motion():
    T = make_trajectory(10, "straight", speed=1.5)
    assert T.shape == (10, 4, 4)
    np.testing.assert_allclose(np.asarray(T[0]), np.eye(4), atol=1e-6)
    # straight: forward motion along +z, 1.5 m per frame
    np.testing.assert_allclose(float(T[9, 2, 3]), 13.5, atol=1e-4)


def test_loop_returns_to_start():
    T = make_trajectory(200, "loop", speed=1.0)
    start = np.asarray(T[0, :3, 3])
    end = np.asarray(T[-1, :3, 3])
    circumference = 199.0
    assert np.linalg.norm(end - start) < circumference * 0.02


def test_render_produces_texture(rng):
    world = make_world(rng, n_frames=8, n_points=512, image_hw=(128, 256))
    left, right = render_frame(world, 0, 128, 256)
    assert left.shape == (128, 256)
    assert float(left.max()) > 0.5  # subpixel shift smears the 1.0 peak
    assert float((left > 0).mean()) > 0.005
    assert float((right > 0).mean()) > 0.005


def test_rendered_geometry_consistent(rng):
    """Projected GT landmarks triangulate back to GT 3D."""
    world = make_world(rng, n_frames=4, n_points=256, image_hw=(128, 256))
    T = world.poses[1]
    X_cam = se3.transform_points(se3.inverse(T), world.points)
    uv_l, uv_r, valid = project_stereo(world.cam, X_cam)
    X2, tri_valid = stereo_rectified(world.cam, uv_l, uv_r)
    m = np.asarray(valid & tri_valid & (X_cam[..., 2] > 2))
    assert m.sum() > 20
    np.testing.assert_allclose(np.asarray(X2)[m], np.asarray(X_cam)[m],
                               rtol=1e-2, atol=1e-2)
