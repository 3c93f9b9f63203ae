"""Ablation timing of slam_step stages (fused combos, not standalone)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from slam1_tpu.config import SlamConfig
from slam1_tpu.utils.synthetic import make_world, render_sequence
from slam1_tpu.models import pipeline, mapping, bow as bow_mod
from slam1_tpu.models.frontend import stereo_frontend
from slam1_tpu.models.tracker import chain_pose, temporal_track
from slam1_tpu.ops import se3

cfg = SlamConfig()
world = make_world(jax.random.PRNGKey(0), n_frames=24, n_points=6000,
                   trajectory="arc", speed=1.0)
lefts, rights = render_sequence(world, cfg.image.height, cfg.image.width)
jax.block_until_ready(lefts)
cam = world.cam

state0 = pipeline._init_state(lefts[0], rights[0], cam, cfg, 0)
jax.block_until_ready(state0.T_w_cam)


def make_step(stages):
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, left, right):
        key, k_pnp, k_bow, k_bow2 = jax.random.split(state.key, 4)
        feats, obs = stereo_frontend(left, right, cam, cfg)
        new = {"key": key, "prev_obs": obs}
        out = [jnp.sum(obs.mask)]
        frame = state.frame + 1
        new["frame"] = frame
        if "track" in stages:
            track = temporal_track(k_pnp, state.prev_obs, feats, cam, cfg,
                                   xi_prior=state.xi_vel)
            T_w, xi_used = chain_pose(state.T_w_cam, track.pnp, state.xi_vel)
            new["T_w_cam"] = T_w
            new["xi_vel"] = xi_used
            out.append(track.pnp.num_inliers)
        else:
            T_w = state.T_w_cam
        if "map" in stages:
            xyz_w = se3.transform_points(T_w, obs.xyz)
            new_map, lm_of = mapping.insert(
                state.map, xyz_w, obs.desc, obs.mask, frame, obs.uv_l,
                cfg.mapping, uv_r_u=obs.uv_r[:, 0], obs_row=state.kf.n)
            new["map"] = new_map
            out.append(jnp.sum(lm_of >= 0))
        if "kf" in stages:
            new["kf"] = mapping.kf_insert(state.kf, obs, T_w,
                                          pipeline.KF_FEATURES,
                                          frame=frame, is_kf=True)
        if "bow" in stages:
            bw = bow_mod.accumulate(state.bow, k_bow, feats.desc, feats.mask,
                                    cfg.bow.sample_desc_per_frame)
            bw = bow_mod.add_frame(bw, k_bow2, frame, feats.desc, feats.mask)
            cand, chi2 = bow_mod.query(bw, frame, feats.desc, feats.mask,
                                       cfg.bow)
            new["bow"] = bw
            out.append(chi2)
        return state._replace(**new), out

    return step


def bench(name, stages, n=30):
    step = make_step(stages)
    st = pipeline._init_state(lefts[0], rights[0], cam, cfg, 0)
    st, _ = step(st, lefts[1], rights[1])
    jax.block_until_ready(st.T_w_cam)
    t0 = time.perf_counter()
    for k in range(n):
        st, _ = step(st, lefts[2 + k % 20], rights[2 + k % 20])
    jax.block_until_ready(st.T_w_cam)
    print(f"{name:42s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")


bench("frontend only", set())
bench("frontend+track", {"track"})
bench("frontend+track+map", {"track", "map"})
bench("frontend+track+map+kf", {"track", "map", "kf"})
bench("frontend+track+map+kf+bow", {"track", "map", "kf", "bow"})
