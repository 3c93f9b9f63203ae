import jax
import jax.numpy as jnp
import numpy as np

from slam1_tpu.config import BowConfig
from slam1_tpu.models import bow
from slam1_tpu.ops.kmeans import assign_words, kmeans_pm1


def clustered_pm1(rng, k=4, per=50, d=64, flip=0.05):
    """k random ±1 prototypes with `flip` bit-noise."""
    protos = rng.choice([-1.0, 1.0], (k, d))
    data, labels = [], []
    for i in range(k):
        noise = rng.uniform(size=(per, d)) < flip
        pts = np.where(noise, -protos[i], protos[i])
        data.append(pts)
        labels += [i] * per
    return (np.concatenate(data).astype(np.float32), np.array(labels),
            protos)


def test_kmeans_recovers_clusters(rng):
    np_rng = np.random.default_rng(0)
    x, labels, protos = clustered_pm1(np_rng)
    mask = jnp.ones(len(x), bool)
    cent, assign = kmeans_pm1(rng, jnp.asarray(x), mask, 4, iters=10)
    assign = np.asarray(assign)
    # same-cluster points get same word, different clusters different
    for i in range(4):
        grp = assign[labels == i]
        assert (grp == grp[0]).mean() > 0.95
    assert len(np.unique([assign[labels == i][0] for i in range(4)])) == 4


def test_kmeans_masked_points_ignored(rng):
    np_rng = np.random.default_rng(1)
    x, labels, _ = clustered_pm1(np_rng, k=2, per=20)
    # poison: far outliers, masked out
    x = np.concatenate([x, 100.0 * np.ones((5, x.shape[1]), np.float32)])
    mask = jnp.asarray([True] * 40 + [False] * 5)
    cent, _ = kmeans_pm1(rng, jnp.asarray(x), mask, 2, iters=8)
    assert float(jnp.abs(cent).max()) <= 1.5


def test_bow_roundtrip_detects_revisit(rng):
    """Frames with identical descriptors should be nearest in chi2."""
    cfg = BowConfig(num_words=8, query_exclude=3, train_iters=6)
    max_frames = 32
    state = bow.init_bow(cfg, max_frames, desc_bits=256, reservoir=1024)
    np_rng = np.random.default_rng(2)
    descs = [np_rng.integers(0, 256, (64, 32), dtype=np.uint8)
             for _ in range(6)]
    mask = jnp.ones(64, bool)
    key = rng
    # accumulate + train
    for i, d in enumerate(descs):
        key, k2 = jax.random.split(key)
        state = bow.accumulate(state, k2, jnp.asarray(d), mask, n_sample=32)
    state = bow.train(state, key, cfg)
    assert bool(state.trained)
    for i, d in enumerate(descs):
        state = bow.add_frame(state, k2, i, jnp.asarray(d), mask)
    # query with frame 1's descriptors at "frame index 9"
    best, val = bow.query(state, 9, jnp.asarray(descs[1]), mask, cfg)
    assert int(best) == 1
    assert float(val) < 0.1


def test_bow_query_respects_exclusion(rng):
    cfg = BowConfig(num_words=8, query_exclude=100, train_iters=4)
    state = bow.init_bow(cfg, 16, reservoir=512)
    np_rng = np.random.default_rng(3)
    d = jnp.asarray(np_rng.integers(0, 256, (32, 32), dtype=np.uint8))
    mask = jnp.ones(32, bool)
    state = bow.accumulate(state, rng, d, mask, n_sample=32)
    state = bow.train(state, rng, cfg)
    state = bow.add_frame(state, rng, 0, d, mask)
    best, val = bow.query(state, 5, d, mask, cfg)  # 5 - 100 < 0: nothing old
    assert int(best) == -1 and float(val) == -1.0


def test_bow_untrained_returns_nothing(rng):
    cfg = BowConfig(num_words=8)
    state = bow.init_bow(cfg, 16, reservoir=512)
    d = jnp.zeros((32, 32), jnp.uint8)
    best, val = bow.query(state, 200, d, jnp.ones(32, bool), cfg)
    assert int(best) == -1
