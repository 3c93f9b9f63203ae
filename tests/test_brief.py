import jax
import jax.numpy as jnp
import numpy as np

from slam1_tpu.ops import brief


def test_pattern_fixed_and_bounded():
    p1 = brief.make_pattern(256, 13.0, 1234)
    p2 = brief.make_pattern(256, 13.0, 1234)
    np.testing.assert_array_equal(p1, p2)
    assert p1.shape == (256, 2, 2)
    assert np.linalg.norm(p1.reshape(-1, 2), axis=1).max() <= 13.0


def test_gaussian_blur_preserves_mean(rng):
    img = jax.random.uniform(rng, (40, 60))
    out = brief.gaussian_blur(img, 1.4)
    assert out.shape == img.shape
    np.testing.assert_allclose(float(out.mean()), float(img.mean()),
                               rtol=0.02)
    assert float(jnp.abs(out - img).mean()) > 1e-4  # actually blurred


def test_extract_patches_centered():
    img = jnp.arange(30 * 40, dtype=jnp.float32).reshape(30, 40)
    xy = jnp.array([[20.0, 15.0]])
    p = brief.extract_patches(img, xy, 5)
    assert p.shape == (1, 5, 5)
    assert float(p[0, 2, 2]) == 15 * 40 + 20


def test_orientation_gradient_direction():
    # intensity increasing to the right -> centroid along +x -> angle 0
    img = jnp.tile(jnp.arange(33, dtype=jnp.float32)[None, :], (33, 1))
    p = img[None]
    ang = float(brief.orientation(p)[0])
    assert abs(ang) < 1e-3
    # increasing downward -> +y -> angle pi/2
    ang2 = float(brief.orientation(jnp.swapaxes(p, 1, 2))[0])
    assert abs(ang2 - np.pi / 2) < 1e-3


def test_descriptor_rotation_invariance(rng):
    """Descriptor of a rotated patch (with orientation steering) should be
    close to the original's."""
    import cv2
    rng_np = np.random.default_rng(1)
    base = cv2.GaussianBlur(
        rng_np.uniform(0, 255, (96, 96)).astype(np.float32), (0, 0), 2.0)
    pattern = brief.make_pattern(256, 13.0, 7)
    xy = jnp.array([[48.0, 48.0]])

    def desc_of(img):
        im = jnp.asarray(img)
        patches = brief.extract_patches(im, xy, 33)
        ang = brief.orientation(patches)
        return np.asarray(
            brief._describe(patches, ang, jnp.asarray(pattern), 256))[0]

    d0 = desc_of(base)
    M = cv2.getRotationMatrix2D((48, 48), 30.0, 1.0)
    rot = cv2.warpAffine(base, M, (96, 96))
    d1 = desc_of(rot)
    ham = bin(int.from_bytes(bytes(d0 ^ d1), "big")).count("1")
    # random descriptors differ by ~128 bits; steered ones stay close
    assert ham < 60, f"hamming {ham}"


def test_unpack_bits_pm1():
    packed = jnp.asarray(np.array([[0b10110001]], np.uint8))
    bits = np.asarray(brief.unpack_bits_pm1(packed))[0]
    # LSB-first: 1,0,0,0,1,1,0,1 -> ±1
    np.testing.assert_array_equal(bits,
                                  np.array([1, -1, -1, -1, 1, 1, -1, 1]))
