"""Backend dispatch: pick Pallas TPU kernels or jnp fallbacks.

Decided once per process at trace time (the backend cannot change under
a live jit cache). Tests force either path explicitly; production code
calls the `*_auto` wrappers.
"""

from __future__ import annotations

import functools

import jax


@functools.lru_cache(maxsize=1)
def use_pallas() -> bool:
    """True when the default backend is a real TPU."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False
