import os

import numpy as np
import pytest

from slam1_tpu.utils import native_loader


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    import cv2
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    truth = []
    for i in range(6):
        img = rng.integers(0, 256, (370, 1226), dtype=np.uint8)
        cv2.imwrite(str(d / f"{i:06d}.png"), img)
        truth.append(img)
    return d, truth


def test_build_library():
    assert native_loader.build_library() is not None
    assert os.path.exists(native_loader._LIB)


def test_native_decodes_match_opencv(png_dir):
    d, truth = png_dir
    paths = sorted(str(p) for p in d.iterdir())
    loader = native_loader.NativeFrameLoader(paths, 384, 1280, ring=4,
                                             threads=2)
    frames = list(loader)
    assert len(frames) == 6
    for img, ref in zip(frames, truth):
        assert img.shape == (384, 1280)
        np.testing.assert_allclose(img[:370, :1226], ref / 255.0,
                                   atol=1e-6)
        assert img[370:].max() == 0.0   # padding


def test_native_loader_in_order(png_dir):
    d, truth = png_dir
    paths = sorted(str(p) for p in d.iterdir())
    # single thread and many threads must both preserve order
    for threads in (1, 4):
        loader = native_loader.NativeFrameLoader(paths, 370, 1226,
                                                 ring=3, threads=threads)
        for i, img in enumerate(loader):
            np.testing.assert_allclose(img, truth[i] / 255.0, atol=1e-6)


def test_stereo_frames(png_dir):
    d, truth = png_dir
    paths = sorted(str(p) for p in d.iterdir())
    pairs = list(native_loader.stereo_frames(paths[:3], paths[3:],
                                             370, 1226))
    assert len(pairs) == 3
    np.testing.assert_allclose(pairs[0][0], truth[0] / 255.0, atol=1e-6)
    np.testing.assert_allclose(pairs[0][1], truth[3] / 255.0, atol=1e-6)


def test_decode_failure_raises(tmp_path):
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not a png at all")
    loader = native_loader.NativeFrameLoader([str(bad)], 64, 64)
    with pytest.raises(IOError):
        next(loader)
