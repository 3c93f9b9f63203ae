"""Global map: fixed-capacity landmark table with voxel-hash dedup,
observation records, and keyframe feature snapshots.

Replaces the reference's unbounded Python map with per-frame KDTree
rebuild and O(n^2) vstack growth (/root/reference/keypoint.py:102-122,
main.py:124-127). TPU design: a pre-allocated landmark table plus an
open-addressed voxel hash (linear probing, `probes` slots); insertion
and merge are pure gather/scatter with masks — no dynamic shapes, no
host round-trips. A KD-tree is shape-dynamic and branchy; quantized
spatial hashing gives the same "merge if a nearby landmark exists"
semantics (ref keypoint.py:110-115) in O(probes) per point.

Known approximation (documented): if several NEW landmarks in one batch
hash to the same empty bucket, the last scatter wins the bucket and the
others stay valid in the table but unreachable via the hash — they can
be re-inserted as duplicates later. With 2^18 buckets at KITTI densities
this affects <<1% of points and only weakens dedup, never correctness.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from slam1_tpu.config import MappingConfig
from slam1_tpu.types import StereoObservations

# Large primes for the 3D voxel hash.
_P1, _P2, _P3 = 73856093, 19349669, 83492791


class MapState(NamedTuple):
    xyz: jnp.ndarray        # (CAP,3) world positions (running mean)
    desc: jnp.ndarray       # (CAP,D) uint8 descriptor of first observation
    count: jnp.ndarray      # (CAP,) int32 merged-observation count
    valid: jnp.ndarray      # (CAP,) bool
    hash_slot: jnp.ndarray  # (H,) int32 bucket -> landmark row, -1 empty
    cursor: jnp.ndarray     # () int32 next free row
    obs: jnp.ndarray        # (OBS_CAP,4) float32 [frame, landmark, u, v]
    obs_cursor: jnp.ndarray # () int32


def init_map(cfg: MappingConfig, desc_bytes: int = 32,
             dtype=jnp.float32) -> MapState:
    return MapState(
        xyz=jnp.zeros((cfg.capacity, 3), dtype),
        desc=jnp.zeros((cfg.capacity, desc_bytes), jnp.uint8),
        count=jnp.zeros((cfg.capacity,), jnp.int32),
        valid=jnp.zeros((cfg.capacity,), bool),
        hash_slot=jnp.full((cfg.hash_size,), -1, jnp.int32),
        cursor=jnp.asarray(0, jnp.int32),
        obs=jnp.zeros((cfg.obs_capacity, 4), dtype),
        obs_cursor=jnp.asarray(0, jnp.int32),
    )


def _voxel_hash(xyz, voxel_size: float, hash_size: int):
    v = jnp.floor(xyz / voxel_size).astype(jnp.int32)
    h = (v[..., 0] * _P1) ^ (v[..., 1] * _P2) ^ (v[..., 2] * _P3)
    return jnp.abs(h) % hash_size


@functools.partial(jax.jit, static_argnames=("cfg",))
def insert(state: MapState, xyz_world, desc, mask, frame_idx, uv,
           cfg: MappingConfig) -> Tuple[MapState, jnp.ndarray]:
    """Merge-or-insert a batch of world points.

    Args:
      xyz_world: (N,3) points, desc: (N,D), mask: (N,), uv: (N,2) pixel
      observation in this frame (for the observation record).
    Returns:
      (new state, (N,) int32 landmark row of each input, -1 if dropped).
    """
    n = xyz_world.shape[0]
    # Hash grid: at least the merge-ball diameter, so that the ball
    # [x-r, x+r] spans at most 2 voxels per axis and probing the 8
    # corner voxels is guaranteed to cover every voxel intersecting it.
    # (A near-duplicate observed from the next frame routinely lands
    # across a voxel boundary; probing only the point's own voxel
    # misses it.)
    vs = max(cfg.voxel_size, 2.0 * cfg.merge_radius)
    h0 = _voxel_hash(xyz_world, vs, cfg.hash_size)

    r = cfg.merge_radius
    r2 = r * r
    lo = jnp.floor((xyz_world - r) / vs).astype(jnp.int32)
    hi = jnp.floor((xyz_world + r) / vs).astype(jnp.int32)

    merge_row = jnp.full((n,), -1, jnp.int32)
    free_bucket = jnp.full((n,), -1, jnp.int32)
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                v = jnp.stack([hi[:, 0] if cx else lo[:, 0],
                               hi[:, 1] if cy else lo[:, 1],
                               hi[:, 2] if cz else lo[:, 2]], axis=-1)
                hc = (v[:, 0] * _P1) ^ (v[:, 1] * _P2) ^ (v[:, 2] * _P3)
                hc = jnp.abs(hc) % cfg.hash_size
                for p in range(cfg.probes):
                    bucket = (hc + p) % cfg.hash_size
                    slot = state.hash_slot[bucket]          # (N,)
                    occ = slot >= 0
                    cand = state.xyz[jnp.maximum(slot, 0)]
                    near = occ & (jnp.sum((cand - xyz_world) ** 2, -1) < r2)
                    merge_row = jnp.where((merge_row < 0) & near, slot,
                                          merge_row)
    # New landmarks are inserted on their OWN voxel's probe chain.
    for p in range(cfg.probes):
        bucket = (h0 + p) % cfg.hash_size
        occ = state.hash_slot[bucket] >= 0
        free_bucket = jnp.where((free_bucket < 0) & ~occ, bucket,
                                free_bucket)

    is_merge = mask & (merge_row >= 0)
    is_new = mask & (merge_row < 0) & (free_bucket >= 0)

    # Allocate rows for inserts by exclusive prefix sum over the batch.
    new_flag = is_new.astype(jnp.int32)
    offsets = jnp.cumsum(new_flag) - new_flag
    new_row = state.cursor + offsets
    fits = new_row < state.xyz.shape[0]
    is_new = is_new & fits

    # --- merges: running-mean position + count bump.
    mrow = jnp.where(is_merge, merge_row, 0)
    add_cnt = is_merge.astype(jnp.int32)
    count = state.count.at[mrow].add(add_cnt)
    old_cnt = state.count[mrow].astype(xyz_world.dtype)
    new_cnt = jnp.maximum(old_cnt + 1.0, 1.0)
    delta = (xyz_world - state.xyz[mrow]) / new_cnt[:, None]
    xyz = state.xyz.at[mrow].add(
        jnp.where(is_merge[:, None], delta, 0.0))

    # --- inserts.
    nrow = jnp.where(is_new, new_row, state.xyz.shape[0] - 1)
    xyz = xyz.at[nrow].set(jnp.where(is_new[:, None], xyz_world,
                                     xyz[nrow]))
    desc_tbl = state.desc.at[nrow].set(
        jnp.where(is_new[:, None], desc, state.desc[nrow]))
    count = count.at[nrow].set(jnp.where(is_new, 1, count[nrow]))
    valid = state.valid.at[nrow].set(
        jnp.where(is_new, True, state.valid[nrow]))
    hash_slot = state.hash_slot.at[
        jnp.where(is_new, free_bucket, cfg.hash_size - 1)].set(
        jnp.where(is_new, nrow, state.hash_slot[
            jnp.where(is_new, free_bucket, cfg.hash_size - 1)]))
    cursor = state.cursor + jnp.sum(new_flag * fits.astype(jnp.int32))

    landmark_of = jnp.where(is_merge, merge_row,
                            jnp.where(is_new, nrow, -1))

    # --- observation records [frame, landmark, u, v].
    has_obs = landmark_of >= 0
    oflag = has_obs.astype(jnp.int32)
    ooff = jnp.cumsum(oflag) - oflag
    orow = state.obs_cursor + ooff
    ofits = orow < state.obs.shape[0]
    w = has_obs & ofits
    orow_c = jnp.where(w, orow, state.obs.shape[0] - 1)
    rec = jnp.stack([
        jnp.full((n,), frame_idx, xyz_world.dtype),
        landmark_of.astype(xyz_world.dtype),
        uv[:, 0], uv[:, 1]], axis=-1)
    obs = state.obs.at[orow_c].set(jnp.where(w[:, None], rec,
                                             state.obs[orow_c]))
    obs_cursor = state.obs_cursor + jnp.sum(oflag * ofits.astype(jnp.int32))

    return MapState(xyz=xyz, desc=desc_tbl, count=count, valid=valid,
                    hash_slot=hash_slot, cursor=cursor, obs=obs,
                    obs_cursor=obs_cursor), landmark_of


class KeyframeStore(NamedTuple):
    """Compact per-keyframe feature snapshots for loop closure /
    relocalization (the reference re-reads raw images instead,
    loop_closure.py:8-11 — we keep the top-K features on device)."""
    xyz: jnp.ndarray    # (F, K, 3) camera-frame 3D points
    desc: jnp.ndarray   # (F, K, D) uint8
    uv: jnp.ndarray     # (F, K, 2)
    mask: jnp.ndarray   # (F, K)
    poses: jnp.ndarray  # (F, 4, 4) world-from-camera at insertion time
    n: jnp.ndarray      # () int32


def init_kf_store(max_frames: int, k: int, desc_bytes: int = 32,
                  dtype=jnp.float32) -> KeyframeStore:
    return KeyframeStore(
        xyz=jnp.zeros((max_frames, k, 3), dtype),
        desc=jnp.zeros((max_frames, k, desc_bytes), jnp.uint8),
        uv=jnp.zeros((max_frames, k, 2), dtype),
        mask=jnp.zeros((max_frames, k), bool),
        poses=jnp.tile(jnp.eye(4, dtype=dtype), (max_frames, 1, 1)),
        n=jnp.asarray(0, jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("k",))
def kf_insert(store: KeyframeStore, obs: StereoObservations, pose,
              k: int) -> KeyframeStore:
    """Keep the k best (valid-first) stereo observations of this frame."""
    # Order: valid first (stable top-k on the mask). If the frame holds
    # fewer than k observations, pad with masked-out repeats of slot 0.
    n = obs.mask.shape[0]
    scores = obs.mask.astype(jnp.float32)
    _, idx = jax.lax.top_k(scores, min(k, n))
    sel_mask = obs.mask[idx]
    if n < k:
        idx = jnp.concatenate([idx, jnp.zeros(k - n, idx.dtype)])
        sel_mask = jnp.concatenate(
            [sel_mask, jnp.zeros(k - n, sel_mask.dtype)])
    row = jnp.minimum(store.n, store.xyz.shape[0] - 1)
    return store._replace(
        xyz=store.xyz.at[row].set(obs.xyz[idx]),
        desc=store.desc.at[row].set(obs.desc[idx]),
        uv=store.uv.at[row].set(obs.uv_l[idx]),
        mask=store.mask.at[row].set(sel_mask),
        poses=store.poses.at[row].set(pose),
        n=store.n + 1,
    )
