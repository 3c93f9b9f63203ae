"""Full SLAM driver: VO + mapping + place recognition + loop closure +
pose-graph backend.

The TPU-native counterpart of /root/reference/main.py:32-187. Per-frame
work is ONE jitted step (`slam_step`): frontend, temporal tracking, PnP,
pose chaining, map insertion, keyframe snapshot, BoW histogram +
loop-candidate query. Only two things live on the host:

  - the sequential frame loop (tracking is inherently serial), and
  - the loop-closure TRIGGER (ref main.py:100: chi^2 < 45): a
    data-dependent decision that would poison jit; the device returns
    (candidate, chi2) every frame and the host launches the jitted
    verification + pose-graph relaxation only when armed & triggered
    (SURVEY.md §7 "hard parts").

Differences from the reference, by design:
  - BoW vocabulary trains online from a descriptor reservoir at a
    configurable frame (ref pre-trains on the whole sequence,
    main.py:43-44).
  - Loop correction = proper pose-graph optimization over odometry +
    loop edges (ref smears translation linearly, loop_closure.py:48-52;
    that variant is kept as posegraph.distribute_error_linear).
  - Checkpoint/export happens via utils.checkpoint snapshots, not
    per-frame text appends (ref XXXport_files.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from slam1_tpu.config import SlamConfig
from slam1_tpu.models import bow as bow_mod
from slam1_tpu.models import mapping
from slam1_tpu.models import posegraph
from slam1_tpu.models.frontend import stereo_frontend
from slam1_tpu.models.loop_closure import verify_loop
from slam1_tpu.models.tracker import chain_pose, temporal_track
from slam1_tpu.ops import se3
from slam1_tpu.ops.camera import StereoCamera
from slam1_tpu.types import StereoObservations

MAX_LOOP_EDGES = 64
KF_FEATURES = 512


class SlamState(NamedTuple):
    T_w_cam: jnp.ndarray
    prev_obs: StereoObservations
    xi_vel: jnp.ndarray
    key: jnp.ndarray
    frame: jnp.ndarray
    map: mapping.MapState
    kf: mapping.KeyframeStore
    bow: bow_mod.BowState
    traj: jnp.ndarray        # (F,4,4)
    rel: jnp.ndarray         # (F,6) twist of edge (i-1 -> i)
    rel_mask: jnp.ndarray    # (F,)


class StepOutput(NamedTuple):
    loop_candidate: jnp.ndarray   # int32 frame index, -1 if none
    loop_chi2: jnp.ndarray        # float32
    num_stereo: jnp.ndarray
    num_inliers: jnp.ndarray
    mean_reproj_err: jnp.ndarray
    pnp_ok: jnp.ndarray


def _init_state(left, right, cam, cfg: SlamConfig, seed: int) -> SlamState:
    feats, obs = stereo_frontend(left, right, cam, cfg)
    mf = cfg.mapping.max_frames
    state = SlamState(
        T_w_cam=jnp.eye(4, dtype=left.dtype),
        prev_obs=obs,
        xi_vel=jnp.zeros(6, left.dtype),
        key=jax.random.PRNGKey(seed),
        frame=jnp.asarray(0, jnp.int32),
        map=mapping.init_map(cfg.mapping),
        kf=mapping.init_kf_store(mf, KF_FEATURES),
        bow=bow_mod.init_bow(cfg.bow, mf),
        traj=jnp.tile(jnp.eye(4, dtype=left.dtype), (mf, 1, 1)),
        rel=jnp.zeros((mf, 6), left.dtype),
        rel_mask=jnp.zeros((mf,), bool),
    )
    state = state._replace(
        kf=mapping.kf_insert(state.kf, obs, state.T_w_cam, KF_FEATURES))
    k1, k2 = jax.random.split(state.key)
    state = state._replace(
        key=k1,
        bow=bow_mod.accumulate(state.bow, k2, feats.desc, feats.mask,
                               cfg.bow.sample_desc_per_frame))
    return state


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def slam_step(state: SlamState, left, right, cam: StereoCamera,
              cfg: SlamConfig):
    key, k_pnp, k_bow = jax.random.split(state.key, 3)

    feats, obs = stereo_frontend(left, right, cam, cfg)
    track = temporal_track(k_pnp, state.prev_obs, feats, cam, cfg,
                           xi_prior=state.xi_vel)
    T_w, xi_used = chain_pose(state.T_w_cam, track.pnp, state.xi_vel)
    frame = state.frame + 1

    # Map: world-frame points of this frame's stereo observations.
    xyz_w = se3.transform_points(T_w, obs.xyz)
    new_map, _ = mapping.insert(state.map, xyz_w, obs.desc, obs.mask,
                                frame.astype(left.dtype), obs.uv_l,
                                cfg.mapping)

    kf = mapping.kf_insert(state.kf, obs, T_w, KF_FEATURES)

    # BoW: reservoir sample, histogram DB row, loop query.
    bw = bow_mod.accumulate(state.bow, k_bow, feats.desc, feats.mask,
                            cfg.bow.sample_desc_per_frame)
    bw = bow_mod.add_frame(bw, frame, feats.desc, feats.mask)
    cand, chi2 = bow_mod.query(bw, frame, feats.desc, feats.mask, cfg.bow)

    traj = state.traj.at[frame].set(T_w)
    rel = state.rel.at[frame].set(xi_used)
    rel_mask = state.rel_mask.at[frame].set(True)

    new_state = SlamState(
        T_w_cam=T_w, prev_obs=obs, xi_vel=xi_used, key=key, frame=frame,
        map=new_map, kf=kf, bow=bw, traj=traj, rel=rel, rel_mask=rel_mask)
    out = StepOutput(
        loop_candidate=cand, loop_chi2=chi2,
        num_stereo=jnp.sum(obs.mask), num_inliers=track.pnp.num_inliers,
        mean_reproj_err=track.pnp.mean_err, pnp_ok=track.pnp.ok)
    # current-frame features returned for host-triggered loop verification
    return new_state, out, feats


@dataclasses.dataclass
class LoopEvent:
    frame: int
    candidate: int
    chi2: float
    num_inliers: int
    accepted: bool


class SlamSystem:
    """Host-side orchestrator (the `slam.run(config)` API, SURVEY C24)."""

    def __init__(self, cam: StereoCamera, cfg: Optional[SlamConfig] = None,
                 seed: int = 0, bow_train_frame: int = 30):
        self.cam = cam
        self.cfg = cfg or SlamConfig()
        self.seed = seed
        self.bow_train_frame = bow_train_frame
        self.state: Optional[SlamState] = None
        self.loop_edges: list = []       # (i, j, Z (4,4) np, weight)
        self.loop_events: list = []
        self.metrics: list = []
        self._rearm_at = 0

    def process(self, left, right):
        cfg = self.cfg
        if self.state is None:
            self.state = _init_state(left, right, self.cam, cfg, self.seed)
            return None

        self.state, out, feats = slam_step(self.state, left, right,
                                           self.cam, cfg)
        frame = int(self.state.frame)

        if frame == self.bow_train_frame:
            key = jax.random.fold_in(jax.random.PRNGKey(self.seed), 999)
            self.state = self.state._replace(
                bow=bow_mod.train(self.state.bow, key, cfg.bow))

        chi2 = float(out.loop_chi2)
        cand = int(out.loop_candidate)
        if (cand >= 0 and 0.0 < chi2 < cfg.bow.chi2_accept
                and frame >= self._rearm_at):
            self._try_close_loop(frame, cand, chi2, feats)

        self.metrics.append(out)
        return out

    def _try_close_loop(self, frame: int, cand: int, chi2: float, feats):
        key = jax.random.fold_in(self.state.key, frame)
        res = verify_loop(key, self.state.kf, cand, feats, self.cam,
                          self.cfg)
        ok = bool(res.ok)
        self.loop_events.append(LoopEvent(
            frame=frame, candidate=cand, chi2=chi2,
            num_inliers=int(res.num_inliers), accepted=ok))
        if not ok:
            return
        # Loop edge measurement: Z = T_cand_frame = inv(T_cur_kf)
        Z = np.asarray(se3.inverse(res.T_cur_kf))
        self.loop_edges.append((cand, frame, Z,
                                float(self.cfg.ba.pg_loop_weight)))
        self._rearm_at = frame + self.cfg.bow.rearm_frames
        # Immediate trajectory relaxation over the affected span.
        self._run_pgo()

    def _run_pgo(self):
        st = self.state
        n = int(st.frame) + 1
        f_cap = st.traj.shape[0]
        ei = jnp.arange(f_cap - 1, dtype=jnp.int32)
        ej = ei + 1
        z_odo = se3.exp_se3(st.rel[1:])
        w_odo = st.rel_mask[1:].astype(jnp.float32)

        le_i = np.zeros(MAX_LOOP_EDGES, np.int32)
        le_j = np.zeros(MAX_LOOP_EDGES, np.int32)
        le_z = np.tile(np.eye(4, dtype=np.float32), (MAX_LOOP_EDGES, 1, 1))
        le_w = np.zeros(MAX_LOOP_EDGES, np.float32)
        for k, (i, j, Z, w) in enumerate(self.loop_edges[:MAX_LOOP_EDGES]):
            le_i[k], le_j[k], le_z[k], le_w[k] = i, j, Z, w

        graph = posegraph.PoseGraph(
            poses=st.traj,
            ei=jnp.concatenate([ei, jnp.asarray(le_i)]),
            ej=jnp.concatenate([ej, jnp.asarray(le_j)]),
            z=jnp.concatenate([z_odo, jnp.asarray(le_z)]),
            w=jnp.concatenate([w_odo, jnp.asarray(le_w)]),
        )
        opt, _ = posegraph.optimize(graph, iters=self.cfg.ba.pg_iters // 5,
                                    cg_iters=self.cfg.ba.cg_iters)
        self.state = st._replace(traj=opt, T_w_cam=opt[int(st.frame)])

    def finalize(self, run_pgo: bool = True):
        if run_pgo and self.loop_edges:
            self._run_pgo()
        return self.poses()

    def poses(self) -> np.ndarray:
        n = int(self.state.frame) + 1
        return np.asarray(self.state.traj[:n])


def run(lefts, rights, cam: StereoCamera, cfg: Optional[SlamConfig] = None,
        seed: int = 0, bow_train_frame: int = 30):
    """Batch API over pre-loaded (F,H,W) stacks. Returns (poses, system)."""
    sys_ = SlamSystem(cam, cfg, seed, bow_train_frame)
    for i in range(lefts.shape[0]):
        sys_.process(lefts[i], rights[i])
    return sys_.finalize(), sys_
