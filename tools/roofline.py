"""Roofline measurement for the hot kernels on the real chip.

The north star (BASELINE.json) demands "the BA solve and ORB matching
kernels at speed-of-light per chip" — this tool makes that claim
measurable instead of asserted (r4 VERDICT missing #2). For each hot
kernel at its PRODUCTION shape it computes:

  - FLOPs and HBM bytes per call (analytic, from the kernel's shapes),
  - measured wall time per call on the device,
  - achieved TFLOP/s and GB/s,
  - % of the binding peak (MXU bf16 for matmul kernels, HBM bandwidth
    for gather/scatter kernels, VPU for elementwise kernels) and the
    speed-of-light time implied by the roofline
    max(flops/peak_compute, bytes/peak_bw).

Kernels covered (production shapes):
  - hamming_top2: 2688x2688x256b fused Hamming top-2 (ops/pallas_kernels)
    — the ORB matching kernel, one call per frame (tracking) and per
    stereo pair.
  - fast_score: 376x1280 FAST-9 score strip kernel — 2+ calls/frame.
  - CG matvec of the global-BA reduced camera system at config-4 scale
    (C=1024 cameras, L=2^17 landmarks, O=65536 observations — the
    BENCH_GLOBAL problem) — the BA solve's inner loop (64 iters/LM
    step).
  - One full global-BA LM iteration at the same scale (linearize +
    Schur + 64 CG + retract) for context.

Measurement recipe (remote-TPU relay discipline, PROFILE_r04):
K iterations are chained inside ONE jitted lax.scan program with a
per-iteration input perturbation (defeats loop-invariant hoisting); the
timer brackets dispatch..real-fetch of a scalar that depends on every
iteration. Two different K cancel the fixed ~12 ms program overhead:
  t_per_iter = (t(2K) - t(K)) / K.

Peaks (TPU v5e, public figures — jax-ml.github.io/scaling-book):
bf16 MXU 197 TFLOP/s, HBM 819 GB/s, VPU f32 ~3.9 TFLOP/s
(8x128 lanes x 4 ALUs x ~0.94 GHz).

Usage: python tools/roofline.py [--out PROFILE_r05.json]
(cwd must be /root/repo for the axon TPU plugin.)
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np

PEAK_BF16 = 197e12     # v5e MXU, bf16 FLOP/s
PEAK_HBM = 819e9       # v5e HBM bytes/s
PEAK_VPU = 3.9e12      # v5e VPU f32 FLOP/s (8x128x4 ALUs @ ~0.94 GHz)


def timed_scan(body, init, k):
    """Wall time of ONE program scanning `body` k times, synced by a
    REAL fetch of a scalar reduced from the carry."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def prog(c0, n):
        c, _ = jax.lax.scan(lambda c, t: (body(c, t), 0.0), c0,
                            jnp.arange(n))
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), c, 0.0)

    _ = np.asarray(prog(init, k))          # compile + warm
    t0 = time.perf_counter()
    _ = np.asarray(prog(init, k))          # REAL sync: fetch
    return time.perf_counter() - t0


def per_iter_time(body, init, k=32):
    """(t(2k) - t(k)) / k — cancels fixed dispatch/fetch overhead."""
    t1 = timed_scan(body, init, k)
    t2 = timed_scan(body, init, 2 * k)
    return max((t2 - t1) / k, 1e-9)


def line(name, t, flops, bytes_, bound, peak):
    sol = max(flops / peak if bound != "hbm" else 0.0,
              bytes_ / PEAK_HBM)
    return {
        "kernel": name,
        "time_us": round(t * 1e6, 1),
        "gflops": round(flops / 1e9, 3),
        "mbytes": round(bytes_ / 1e6, 2),
        "achieved_tflops": round(flops / t / 1e12, 3),
        "achieved_gbs": round(bytes_ / t / 1e9, 1),
        "bound": bound,
        "pct_of_peak": round(100.0 * (
            (flops / t) / peak if bound != "hbm"
            else (bytes_ / t) / PEAK_HBM), 1),
        "sol_us": round(sol * 1e6, 1),
        "x_from_sol": round(t / sol, 1) if sol > 0 else None,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    os.chdir(_REPO)

    import jax
    import jax.numpy as jnp

    from slam1_tpu.config import SlamConfig
    from slam1_tpu.models.ba import (BAProblem, _cost, _inv3x3,
                                     _linearize, bundle_adjust,
                                     make_problem)
    from slam1_tpu.ops.lsq import inv_spd6

    cfg = SlamConfig()
    results = []
    backend = jax.default_backend()
    print(f"backend: {backend}", file=sys.stderr)

    # ---------------------------------------------------- hamming_top2
    from slam1_tpu.ops.pallas_kernels import fast_score, hamming_top2
    N = M = cfg.detector.max_kp          # 2688 production
    B = cfg.detector.brief_pairs         # 256
    key = jax.random.PRNGKey(0)
    a = (jax.random.bernoulli(key, 0.5, (N, B)).astype(jnp.int8) * 2 - 1)
    b = (jax.random.bernoulli(jax.random.fold_in(key, 1), 0.5,
                              (M, B)).astype(jnp.int8) * 2 - 1)
    ma = jnp.ones((N,), bool)
    mb = jnp.ones((M,), bool)

    def ham_body(c, t):
        # Perturb one operand per iteration (defeat hoisting): flipping
        # the sign of A's rows changes every distance; cost N*B adds.
        s = (1 - 2 * (t % 2)).astype(jnp.int8)
        d1, d2, idx, carg = hamming_top2(a * s, b, ma, mb)
        return (c[0] + jnp.sum(d1), c[1] + jnp.sum(carg))

    t = per_iter_time(ham_body, (jnp.zeros((), jnp.int32),) * 2, k=64)
    flops = 2.0 * N * M * B              # MXU MACs
    bts = (N * B + M * B) * 1 + (3 * N + 2 * M) * 4   # int8 in, int32 out
    results.append(line(f"hamming_top2 {N}x{M}x{B}b", t, flops, bts,
                        "mxu-bf16", PEAK_BF16))

    # ------------------------------------------------------ fast_score
    H, W = cfg.image.height, cfg.image.width
    img = jax.random.uniform(jax.random.fold_in(key, 2), (H, W))

    def fs_body(c, t):
        s = fast_score(img + c * 1e-20, cfg.detector.fast_threshold,
                       arc=cfg.detector.fast_arc)
        return c + jnp.sum(s) * 0.0 + jnp.max(s) * 1e-30

    t = per_iter_time(fs_body, jnp.zeros(()), k=64)
    # per-pixel per-tap work: diff(1) + 2 cmp + 2 run-updates(2 ops) +
    # corner(3) = ~10 ops x 24 taps + score adds 4x16; VPU-bound.
    flops = H * W * (24 * 10 + 16 * 4)
    strip = 48
    n_strips = -(-H // strip)
    bts = (n_strips * (strip + 6) * W + H * W) * 4
    results.append(line(f"fast_score {H}x{W}", t, flops, bts,
                        "vpu-f32", PEAK_VPU))

    # ------------------------------- global-BA CG matvec @ config-4
    C, L, O = 1024, 1 << 17, 1 << 16     # BENCH_GLOBAL shapes
    kk = jax.random.fold_in(key, 3)
    ci = jax.random.randint(kk, (O,), 0, C)
    li = jax.random.randint(jax.random.fold_in(kk, 1), (O,), 0, L)
    Wc = jax.random.normal(jax.random.fold_in(kk, 2), (O, 6, 3)) * 0.1
    Hll_inv = _inv3x3(
        jnp.eye(3) * 4.0 + jax.random.normal(
            jax.random.fold_in(kk, 3), (L, 3, 3)) * 0.1)
    Hcc_d = (jnp.eye(6) * 8.0
             + jax.random.normal(jax.random.fold_in(kk, 4),
                                 (C, 6, 6)) * 0.1)

    # Mirror models/ba._schur_solve's production matvec: sorted-segment
    # reductions (cumsum + boundary gathers) instead of scatter-adds —
    # the r5 fix for the 60x-from-SoL scatter bottleneck.
    from slam1_tpu.models.ba import _segends, segment_sum_sorted
    c_perm = jnp.argsort(ci)
    c_ends = _segends(ci[c_perm], C)
    l_perm = jnp.argsort(li)
    l_ends = _segends(li[l_perm], L)

    def matvec(x):
        u = jnp.einsum("oij,oi->oj", Wc, x[ci])
        s = segment_sum_sorted(u[l_perm], l_ends)
        v = jnp.einsum("lij,lj->li", Hll_inv, s)
        y = jnp.einsum("oij,oj->oi", Wc, v[li])
        out = jnp.einsum("cij,cj->ci", Hcc_d, x)
        out = out - segment_sum_sorted(y[c_perm], c_ends)
        return out.at[0].set(x[0])

    def mv_body(x, t):
        y = matvec(x)
        return y / (jnp.linalg.norm(y) + 1.0)

    x0 = jax.random.normal(jax.random.fold_in(kk, 5), (C, 6))
    t = per_iter_time(mv_body, x0, k=64)
    flops = O * (36 + 3 + 36 + 6) + L * 18 + C * 72
    bts = (2 * O * 18 * 4          # W read twice
           + L * 9 * 4             # Hll_inv
           + L * 3 * 4 * 2         # s scatter + v write
           + C * 36 * 4            # Hcc_d
           + O * (4 + 4 + 6 * 4 + 3 * 4))   # indices + x/v gathers
    results.append(line(f"gba_cg_matvec C={C} L=2^17 O=2^16", t, flops,
                        bts, "hbm", PEAK_HBM))

    # ------------------------- one full global-BA LM iteration
    poses = jnp.tile(jnp.eye(4), (C, 1, 1))
    pts = jax.random.normal(jax.random.fold_in(kk, 6), (L, 3)) * 5.0
    pts = pts + jnp.array([0.0, 0.0, 20.0])
    uv = jax.random.uniform(jax.random.fold_in(kk, 7), (O, 2),
                            minval=0.0, maxval=1000.0)
    w = jnp.ones((O,))
    from slam1_tpu.ops.camera import StereoCamera
    cam = StereoCamera.kitti_default()
    prob = make_problem(poses, pts, ci, li, uv, w)
    import dataclasses as _dc
    ba1 = _dc.replace(cfg.ba, lm_iters=1)

    def ba_body(c, t):
        p2 = prob._replace(points=prob.points + c * 1e-20)
        out, cost = bundle_adjust(p2, cam, ba1)
        return c + cost * 1e-30

    t_lm = per_iter_time(ba_body, jnp.zeros(()), k=4)
    # Dominated by 64 CG matvecs + linearize (jacfwd ~ 10x residual).
    flops_lm = 64 * (O * 81 + L * 18 + C * 72) + O * 3 * (6 + 3) * 30
    bts_lm = 64 * bts
    results.append(line("global_ba 1 LM iter (64 CG)", t_lm, flops_lm,
                        bts_lm, "hbm", PEAK_HBM))

    # ------------------------------------------------------- report
    hdr = (f"| kernel | t (us) | GFLOP | MB | TFLOP/s | GB/s | bound "
           f"| % peak | SoL (us) | x from SoL |")
    sep = "|" + "---|" * 10
    print(hdr)
    print(sep)
    for r in results:
        print(f"| {r['kernel']} | {r['time_us']} | {r['gflops']} "
              f"| {r['mbytes']} | {r['achieved_tflops']} "
              f"| {r['achieved_gbs']} | {r['bound']} "
              f"| {r['pct_of_peak']} | {r['sol_us']} "
              f"| {r['x_from_sol']} |")
    out = {"backend": backend, "peaks": {"bf16": PEAK_BF16,
                                         "hbm": PEAK_HBM,
                                         "vpu": PEAK_VPU},
           "kernels": results}
    if args.out:
        json.dump(out, open(args.out, "w"), indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
