import jax
import jax.numpy as jnp
import numpy as np

from slam1_tpu.ops import hamming


def rand_desc(rng, n):
    return rng.integers(0, 256, (n, 32), dtype=np.uint8)


def np_hamming(a, b):
    ab = np.unpackbits(a[:, None, :], axis=-1)
    bb = np.unpackbits(b[None, :, :], axis=-1)
    return (ab != bb).sum(-1)


def test_distance_matrix_matches_numpy():
    rng = np.random.default_rng(0)
    a, b = rand_desc(rng, 17), rand_desc(rng, 23)
    d = np.asarray(hamming.distance_matrix(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(d, np_hamming(a, b))


def test_distance_zero_on_self():
    rng = np.random.default_rng(1)
    a = rand_desc(rng, 8)
    d = np.asarray(hamming.distance_matrix(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_array_equal(np.diag(d), 0)


def test_masked_rows_never_match():
    rng = np.random.default_rng(2)
    a = rand_desc(rng, 8)
    mask = np.ones(8, bool)
    mask[3] = False
    m = hamming.match(jnp.asarray(a), jnp.asarray(a),
                      jnp.asarray(mask), jnp.asarray(mask),
                      ratio=1.1, max_distance=256, cross_check=False)
    got = np.asarray(m.mask)
    assert not got[3]
    assert got[[0, 1, 2, 4, 5, 6, 7]].all()
    np.testing.assert_array_equal(
        np.asarray(m.idx)[got], np.arange(8)[got])


def test_ratio_test_rejects_ambiguous():
    # two identical descriptors in B -> d1 == d2 -> ratio test fails
    rng = np.random.default_rng(3)
    a = rand_desc(rng, 4)
    b = np.concatenate([a[:1], a[:1], a[1:]])  # duplicate of a[0]
    m = hamming.match(jnp.asarray(a), jnp.asarray(b), ratio=0.8,
                      cross_check=False)
    assert not bool(m.mask[0])   # ambiguous
    assert bool(m.mask[1])


def test_cross_check():
    a = np.zeros((2, 32), np.uint8)
    a[1, 0] = 255                      # a0=0s, a1 differs by 8 bits
    b = np.zeros((3, 32), np.uint8)    # b0 == a0, b1 garbage, b2 far
    b[1, :16] = 170
    b[2] = 255
    m = hamming.match(jnp.asarray(a), jnp.asarray(b), ratio=0.95,
                      max_distance=256, cross_check=True)
    assert bool(m.mask[0]) and int(m.idx[0]) == 0


def test_match_is_jittable():
    rng = np.random.default_rng(4)
    a = jnp.asarray(rand_desc(rng, 64))
    f = jax.jit(lambda x, y: hamming.match(x, y))
    m = f(a, a)
    assert bool(np.asarray(m.mask).all())
