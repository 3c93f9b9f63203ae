"""Reference-parity pose-only backend: motion-prior regularized segment
optimization with a loop-endpoint constraint.

Functional equivalent of the reference's ACTIVE backend
(/root/reference/BundleAdjustment.py:107-183 + run_BA :186-225): the
trajectory segment between the two loop frames is re-optimized so that
(a) each frame's relative twist stays near its odometry value under
per-axis motion-prior weights (ref :124-135 — x=1, y=1, z=5e-4,
rot=0.5/0.05/1) and (b) the composed chain matches the loop-closure
measurement with a large endpoint weight (ref :140-141, x1000).

Differences by design (and ref bugs NOT copied, SURVEY.md "quirks"):
  - solved by jitted LM on device, not scipy TRF with a hand-built
    lil_matrix sparsity pattern (:146-171);
  - the endpoint residual is a proper SE(3) log, not a raw matrix
    difference;
  - the "without loop" second stage actually omits the loop terms (the
    reference's wrapper accidentally keeps them, :176);
  - no file IO at import time (:12-14).

The segment length is static (pad `valid` mask) so one compilation
serves all closures.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from slam1_tpu.ops import se3
from slam1_tpu.ops.lsq import levenberg_marquardt

# ref BundleAdjustment.py:124-129 per-axis costs (trans xyz, rot xyz)
REF_MOTION_WEIGHTS = (1.0, 1.0, 5e-4, 0.5, 0.05, 1.0)
REF_ENDPOINT_WEIGHT = 1000.0


@functools.partial(jax.jit, static_argnames=("iters", "with_loop"))
def optimize_segment(rel_twists, valid, Z_loop,
                     motion_weights=REF_MOTION_WEIGHTS,
                     endpoint_weight=REF_ENDPOINT_WEIGHT,
                     iters: int = 20, with_loop: bool = True):
    """Optimize a segment of per-frame relative twists.

    Args:
      rel_twists: (S,6) odometry twists frame k -> k+1 over the segment.
      valid: (S,) mask (padding rows get zero weight and stay fixed).
      Z_loop: (4,4) measured transform from segment start to segment end
        (from loop-closure verification).
    Returns:
      (optimized twists (S,6), final cost).
    """
    s = rel_twists.shape[0]
    w_axis = jnp.sqrt(jnp.asarray(motion_weights, rel_twists.dtype))
    vmask = valid.astype(rel_twists.dtype)

    def residual(flat):
        xi = flat.reshape(s, 6)
        prior = ((xi - rel_twists) * w_axis[None, :]).reshape(-1)
        w_prior = jnp.repeat(vmask, 6)
        if not with_loop:
            return prior, w_prior
        # compose the chain over valid rows only
        def comp(T, i):
            step = se3.exp_se3(xi[i])
            step = jnp.where(valid[i], step, jnp.eye(4, dtype=step.dtype))
            return T @ step, None
        T_chain, _ = jax.lax.scan(comp, jnp.eye(4, dtype=xi.dtype),
                                  jnp.arange(s))
        end = jnp.sqrt(jnp.asarray(endpoint_weight, xi.dtype)) * \
            se3.log_se3(se3.inverse(Z_loop) @ T_chain)
        return (jnp.concatenate([prior, end]),
                jnp.concatenate([w_prior, jnp.ones(6, xi.dtype)]))

    x, cost = levenberg_marquardt(residual, rel_twists.reshape(-1),
                                  iters=iters)
    return x.reshape(s, 6), cost


def recompose(T_start, rel_twists, valid):
    """Chain optimized twists back into absolute poses (S+1,4,4)."""
    def comp(T, i):
        step = se3.exp_se3(rel_twists[i])
        step = jnp.where(valid[i], step, jnp.eye(4, dtype=step.dtype))
        T2 = T @ step
        return T2, T2
    _, Ts = jax.lax.scan(comp, T_start, jnp.arange(rel_twists.shape[0]))
    return jnp.concatenate([T_start[None], Ts], axis=0)
