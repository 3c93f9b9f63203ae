"""Compute-path ops: geometry, kernels, solvers (all jit/vmap friendly)."""
