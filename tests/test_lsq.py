import jax
import jax.numpy as jnp
import numpy as np

from slam1_tpu.ops import lsq


def quadratic_residual(target):
    def fn(x):
        r = x - target
        return r, jnp.ones_like(r)
    return fn


def test_gauss_newton_linear_exact():
    target = jnp.array([1.0, -2.0, 3.0])
    x, cost = lsq.gauss_newton(quadratic_residual(target),
                               jnp.zeros(3), iters=3)
    np.testing.assert_allclose(np.asarray(x), np.asarray(target), atol=1e-4)
    assert float(cost) < 1e-8


def test_gauss_newton_rosenbrock_style():
    def fn(x):
        r = jnp.array([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])
        return r, jnp.ones(2)
    x, cost = lsq.gauss_newton(fn, jnp.array([-1.2, 1.0]), iters=30,
                               damping=1e-8)
    np.testing.assert_allclose(np.asarray(x), [1.0, 1.0], atol=1e-3)


def test_masked_residuals_ignored():
    def fn(x):
        r = jnp.concatenate([x - 2.0, x + 100.0])
        w = jnp.concatenate([jnp.ones_like(x), jnp.zeros_like(x)])
        return r, w
    x, _ = lsq.gauss_newton(fn, jnp.zeros(2), iters=5)
    np.testing.assert_allclose(np.asarray(x), [2.0, 2.0], atol=1e-4)


def test_lm_matches_scipy_on_curve_fit():
    from scipy.optimize import least_squares
    t = np.linspace(0, 1, 30).astype(np.float32)
    y = 2.5 * np.exp(-1.3 * t) + 0.01 * np.sin(20 * t).astype(np.float32)

    def res_np(p):
        return p[0] * np.exp(p[1] * t) - y

    sp = least_squares(res_np, np.array([1.0, 0.0]), method="lm")

    tj, yj = jnp.asarray(t), jnp.asarray(y)

    def res_jax(p):
        r = p[0] * jnp.exp(p[1] * tj) - yj
        return r, jnp.ones_like(r)

    x, cost = lsq.levenberg_marquardt(res_jax, jnp.array([1.0, 0.0]),
                                      iters=30)
    np.testing.assert_allclose(np.asarray(x), sp.x, rtol=1e-2)


def test_lm_never_increases_cost():
    def fn(x):
        r = jnp.array([jnp.sin(x[0]) * 5 + x[0] * 0.1 - 1.0])
        return r, jnp.ones(1)
    x0 = jnp.array([2.0])
    _, costs = jax.lax.scan(
        lambda c, _: (c, c), None, None, length=1)  # placeholder
    x, c = lsq.levenberg_marquardt(fn, x0, iters=20)
    r0, w0 = fn(x0)
    assert float(c) <= float(jnp.sum(w0 * r0 * r0)) + 1e-6


def test_huber_weights():
    r2 = jnp.array([0.0, 1.0, 4.0, 100.0])
    w = np.asarray(lsq.huber_weights(r2, delta=2.0))
    np.testing.assert_allclose(w[:3], 1.0, rtol=1e-6)
    np.testing.assert_allclose(w[3], 0.2, rtol=1e-6)
