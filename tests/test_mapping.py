import jax
import jax.numpy as jnp
import numpy as np

from slam1_tpu.config import MappingConfig
from slam1_tpu.models import mapping
from slam1_tpu.types import StereoObservations


def cfg_small():
    return MappingConfig(capacity=256, hash_size=1024, obs_capacity=1024,
                         voxel_size=0.5, merge_radius=0.5, max_frames=32)


def test_insert_new_points():
    cfg = cfg_small()
    st = mapping.init_map(cfg)
    pts = jnp.asarray(np.random.default_rng(0).uniform(-10, 10, (20, 3)),
                      jnp.float32)
    desc = jnp.zeros((20, 32), jnp.uint8)
    mask = jnp.ones(20, bool)
    uv = jnp.zeros((20, 2))
    st, rows = mapping.insert(st, pts, desc, mask, 0.0, uv, cfg)
    assert int(st.cursor) == 20
    assert int(st.valid.sum()) == 20
    assert (np.asarray(rows) >= 0).all()
    np.testing.assert_allclose(np.asarray(st.xyz[:20]), np.asarray(pts),
                               atol=1e-5)
    assert int(st.obs_cursor) == 20


def test_reinsert_merges():
    cfg = cfg_small()
    st = mapping.init_map(cfg)
    pts = jnp.asarray(np.random.default_rng(1).uniform(-10, 10, (15, 3)),
                      jnp.float32)
    desc = jnp.zeros((15, 32), jnp.uint8)
    mask = jnp.ones(15, bool)
    uv = jnp.zeros((15, 2))
    st, rows1 = mapping.insert(st, pts, desc, mask, 0.0, uv, cfg)
    # same points + small jitter within merge radius -> all merged
    jitter = pts + 0.05
    st, rows2 = mapping.insert(st, jitter, desc, mask, 1.0, uv, cfg)
    assert int(st.cursor) == 15, "no new landmarks expected"
    np.testing.assert_array_equal(np.asarray(rows1), np.asarray(rows2))
    assert (np.asarray(st.count[:15]) == 2).all()
    # observation records doubled
    assert int(st.obs_cursor) == 30


def test_masked_points_skipped():
    cfg = cfg_small()
    st = mapping.init_map(cfg)
    pts = jnp.ones((8, 3))
    mask = jnp.zeros(8, bool)
    st, rows = mapping.insert(st, pts, jnp.zeros((8, 32), jnp.uint8), mask,
                              0.0, jnp.zeros((8, 2)), cfg)
    assert int(st.cursor) == 0
    assert (np.asarray(rows) == -1).all()


def test_distant_points_not_merged():
    cfg = cfg_small()
    st = mapping.init_map(cfg)
    a = jnp.asarray([[0.0, 0.0, 5.0]])
    b = jnp.asarray([[0.0, 0.0, 25.0]])
    d = jnp.zeros((1, 32), jnp.uint8)
    m = jnp.ones(1, bool)
    uv = jnp.zeros((1, 2))
    st, _ = mapping.insert(st, a, d, m, 0.0, uv, cfg)
    st, _ = mapping.insert(st, b, d, m, 1.0, uv, cfg)
    assert int(st.cursor) == 2


def test_capacity_overflow_drops():
    cfg = MappingConfig(capacity=8, hash_size=64, obs_capacity=16,
                        max_frames=8)
    st = mapping.init_map(cfg)
    pts = jnp.asarray(
        np.random.default_rng(2).uniform(-50, 50, (20, 3)), jnp.float32)
    st, rows = mapping.insert(st, pts, jnp.zeros((20, 32), jnp.uint8),
                              jnp.ones(20, bool), 0.0, jnp.zeros((20, 2)),
                              cfg)
    assert int(st.cursor) <= 8
    assert int(st.valid.sum()) <= 8


def test_obs_records_content():
    cfg = cfg_small()
    st = mapping.init_map(cfg)
    pts = jnp.asarray([[1.0, 2.0, 3.0]])
    uv = jnp.asarray([[100.0, 50.0]])
    st, rows = mapping.insert(st, pts, jnp.zeros((1, 32), jnp.uint8),
                              jnp.ones(1, bool), 7.0, uv, cfg)
    rec = np.asarray(st.obs[0])
    assert rec[0] == 7.0                      # frame
    assert rec[1] == int(rows[0])             # landmark id
    np.testing.assert_allclose(rec[2:], [100.0, 50.0])


def test_kf_store_roundtrip():
    store = mapping.init_kf_store(4, k=8)
    n = 16
    obs = StereoObservations(
        uv_l=jnp.arange(n * 2, dtype=jnp.float32).reshape(n, 2),
        uv_r=jnp.zeros((n, 2)),
        xyz=jnp.ones((n, 3)),
        desc=jnp.full((n, 32), 3, jnp.uint8),
        mask=jnp.asarray([True] * 5 + [False] * (n - 5)),
    )
    pose = jnp.eye(4).at[0, 3].set(2.0)
    store = mapping.kf_insert(store, obs, pose, k=8)
    assert int(store.n) == 1
    assert int(store.mask[0].sum()) == 5     # only the valid ones
    np.testing.assert_allclose(np.asarray(store.poses[0]),
                               np.asarray(pose))
