"""Single-chip SLAM throughput benchmark (driver contract).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures frames/s of the full jitted VO step (tiled FAST/BRIEF detect on
both stereo images, MXU Hamming L-R + temporal matching, triangulation,
256-hypothesis RANSAC-PnP, pose chaining) on KITTI-sized synthetic
frames (384x1280 canvas ~ 1226x370 KITTI, ref XXXport_files.py:51).

vs_baseline: ratio to a reference-equivalent OpenCV pipeline (tiled ORB
x2, FLANN L-R match, triangulate, FLANN temporal match, solvePnPRansac —
mirroring /root/reference/main.py:76-122's per-frame hot path) timed on
the same images on this host's CPU. The baseline number is cached in
.bench_baseline.json after first measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

N_FRAMES = 24
WARMUP = 3


def measure_ours(lefts, rights, cam, cfg):
    import jax
    from slam1_tpu.models import vo

    state = vo.init_state(lefts[0], rights[0], cam, cfg)
    # Warm-up: compile + a few steps.
    for i in range(1, 1 + WARMUP):
        state, m = vo.vo_step(state, lefts[i], rights[i], cam, cfg)
    jax.block_until_ready(state.T_w_cam)

    t0 = time.perf_counter()
    n = 0
    for i in range(1 + WARMUP, lefts.shape[0]):
        state, m = vo.vo_step(state, lefts[i], rights[i], cam, cfg)
        n += 1
    jax.block_until_ready(state.T_w_cam)
    dt = time.perf_counter() - t0
    return n / dt


def measure_slam(lefts, rights, cam, cfg):
    """Full SLAM pipeline fps: frontend + tracking + mapping + BoW +
    loop-trigger polling + windowed local BA cadence (r1 VERDICT #4:
    the shipped pipeline must be benched, not just VO)."""
    import jax

    from slam1_tpu.models import pipeline

    # Warm pass over the whole clip: compiles every jit the pipeline can
    # reach (slam_step, BoW train/backfill, windowed local BA).
    warm = pipeline.SlamSystem(cam, cfg, bow_train_frame=8)
    for i in range(lefts.shape[0]):
        warm.process(lefts[i], rights[i])
    jax.block_until_ready(warm.state.T_w_cam)

    sys_ = pipeline.SlamSystem(cam, cfg, bow_train_frame=8)
    sys_.process(lefts[0], rights[0])
    t0 = time.perf_counter()
    n = 0
    for i in range(1, lefts.shape[0]):
        sys_.process(lefts[i], rights[i])
        n += 1
    jax.block_until_ready(sys_.state.T_w_cam)
    dt = time.perf_counter() - t0
    return n / dt


def measure_ate(cfg, n_frames=300):
    """ATE half of the BASELINE headline ("ATE parity ... at >=10x"):
    full pipeline (mapping + BoW + loop closure + local BA + final PGO)
    over an n_frames synthetic loop at production resolution, RMSE vs
    GT without alignment (the ref's runtime GT diff, main.py:143-146,
    is final-pose-only; RMSE over the whole trajectory is stricter)."""
    import jax

    from slam1_tpu.models import pipeline
    from slam1_tpu.utils.evalmetrics import ate_rmse
    from slam1_tpu.utils.synthetic import make_world, render_sequence

    world = make_world(jax.random.PRNGKey(11), n_frames=n_frames,
                       n_points=40 * n_frames, trajectory="loop",
                       speed=1.0)
    lefts, rights = render_sequence(world, cfg.image.height,
                                    cfg.image.width)
    jax.block_until_ready(lefts)
    sys_ = pipeline.SlamSystem(world.cam, cfg, bow_train_frame=30)
    for i in range(n_frames):
        sys_.process(lefts[i], rights[i])
    poses = sys_.finalize()
    ate = float(ate_rmse(poses, np.asarray(world.poses), align=False))
    return ate, len(sys_.loop_edges)


def measure_reference_equivalent(lefts_np, rights_np, cam):
    """OpenCV pipeline shaped like the reference's hot loop."""
    try:
        import cv2
    except ImportError:
        return None
    K = np.asarray(cam.K, np.float64)
    P_l, P_r = (np.asarray(p, np.float64) for p in cam.projection_matrices())

    def detect_tiled(img):
        # ref orb.py:4-25: 5x10 tiles, ORB per tile
        h, w = img.shape
        th, tw = h // 5, w // 10
        kps, descs = [], []
        orb = cv2.ORB_create(nfeatures=40)
        for r in range(5):
            for c in range(10):
                tile = img[r * th:(r + 1) * th, c * tw:(c + 1) * tw]
                kp, des = orb.detectAndCompute(tile, None)
                if des is None:
                    continue
                for k in kp:
                    k.pt = (k.pt[0] + c * tw, k.pt[1] + r * th)
                kps += list(kp)
                descs.append(des)
        if not descs:
            return [], None
        return kps, np.concatenate(descs)

    bf = cv2.BFMatcher(cv2.NORM_HAMMING)

    def step(li, ri, l_next):
        kl, dl = detect_tiled(li)
        kr, dr = detect_tiled(ri)
        kn, dn = detect_tiled(l_next)
        if dl is None or dr is None or dn is None:
            return
        # L-R match + ratio (ref keypoint.py:44-51)
        pairs = bf.knnMatch(dl, dr, k=2)
        good = [m for m, n2 in (p for p in pairs if len(p) == 2)
                if m.distance < 0.8 * n2.distance]
        if len(good) < 9:
            return
        uvl = np.float64([kl[m.queryIdx].pt for m in good])
        uvr = np.float64([kr[m.trainIdx].pt for m in good])
        cv2.findFundamentalMat(uvl, uvr, cv2.FM_LMEDS)  # ref epipolar filter
        X = cv2.triangulatePoints(P_l, P_r, uvl.T, uvr.T)
        X = (X[:3] / X[3]).T
        d_tri = np.concatenate([dl[m.queryIdx:m.queryIdx + 1] for m in good])
        # temporal match (ref Point3D.py:33-53)
        pairs2 = bf.knnMatch(d_tri, dn, k=2)
        good2 = [m for m, n2 in (p for p in pairs2 if len(p) == 2)
                 if m.distance < 0.8 * n2.distance]
        if len(good2) < 6:
            return
        X3 = np.float64([X[m.queryIdx] for m in good2])
        uv2 = np.float64([kn[m.trainIdx].pt for m in good2])
        cv2.solvePnPRansac(X3, uv2, K, None, reprojectionError=3.0)

    u8_l = [(np.asarray(l) * 255).astype(np.uint8) for l in lefts_np]
    u8_r = [(np.asarray(r) * 255).astype(np.uint8) for r in rights_np]
    # warm-up one step, then time
    step(u8_l[0], u8_r[0], u8_l[1])
    n = min(8, len(u8_l) - 1)
    t0 = time.perf_counter()
    for i in range(n):
        step(u8_l[i], u8_r[i], u8_l[i + 1])
    dt = time.perf_counter() - t0
    return n / dt


def main():
    os.chdir(_REPO)
    import jax

    from slam1_tpu.config import SlamConfig
    from slam1_tpu.utils.synthetic import make_world, render_sequence

    cfg = SlamConfig()
    world = make_world(jax.random.PRNGKey(0), n_frames=N_FRAMES,
                       n_points=6000, trajectory="arc", speed=1.0)
    lefts, rights = render_sequence(world, cfg.image.height,
                                    cfg.image.width)
    jax.block_until_ready(lefts)

    fps = measure_ours(lefts, rights, world.cam, cfg)
    slam_fps = measure_slam(lefts, rights, world.cam, cfg)
    try:
        ate, n_loops = measure_ate(cfg, n_frames=300)
    except Exception as e:  # ATE half must not kill the fps contract
        print(f"measure_ate failed: {e}", file=sys.stderr)
        ate, n_loops = None, None

    cache_path = os.path.join(_REPO, ".bench_baseline.json")
    baseline_fps = None
    if os.path.exists(cache_path):
        try:
            baseline_fps = json.load(open(cache_path))["reference_fps"]
        except Exception:
            baseline_fps = None
    if baseline_fps is None:
        baseline_fps = measure_reference_equivalent(
            np.asarray(lefts[:10]), np.asarray(rights[:10]), world.cam)
        if baseline_fps:
            json.dump({"reference_fps": baseline_fps,
                       "host": "cpu-reference-equivalent"},
                      open(cache_path, "w"))

    vs = fps / baseline_fps if baseline_fps else float("nan")
    print(json.dumps({
        "metric": "vo_frames_per_s_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs, 3) if vs == vs else None,
        "slam_frames_per_s_per_chip": round(slam_fps, 3),
        "ate_rmse_m": round(ate, 4) if ate is not None else None,
        "loop_closures": n_loops,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
