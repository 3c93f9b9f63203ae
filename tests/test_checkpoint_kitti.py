import os

import jax.numpy as jnp
import numpy as np
import pytest

from slam1_tpu.models.mapping import init_map
from slam1_tpu.config import MappingConfig
from slam1_tpu.utils import checkpoint
from slam1_tpu.utils.kitti import (KittiSequence, load_calib, load_poses,
                                   pad_to_canvas)


def test_checkpoint_roundtrip(tmp_path):
    cfg = MappingConfig(capacity=64, hash_size=128, obs_per_frame=16,
                        max_frames=8)
    st = init_map(cfg)
    st = st._replace(cursor=jnp.asarray(5, jnp.int32))
    p = str(tmp_path / "snap.npz")
    checkpoint.save(p, st, meta={"frame": 5})
    st2 = checkpoint.load(p, init_map(cfg))
    assert int(st2.cursor) == 5
    np.testing.assert_array_equal(np.asarray(st2.hash_slot),
                                  np.asarray(st.hash_slot))
    assert checkpoint.load_meta(p)["frame"] == 5


def test_checkpoint_rejects_mismatched_tree(tmp_path):
    cfg = MappingConfig(capacity=64, hash_size=128, obs_per_frame=16,
                        max_frames=8)
    p = str(tmp_path / "snap.npz")
    checkpoint.save(p, init_map(cfg))
    with pytest.raises(ValueError):
        checkpoint.load(p, (jnp.zeros(3),))


def _write_kitti_fixture(root):
    os.makedirs(os.path.join(root, "image_0"), exist_ok=True)
    os.makedirs(os.path.join(root, "image_1"), exist_ok=True)
    import cv2
    rng = np.random.default_rng(0)
    for i in range(3):
        img = (rng.uniform(0, 255, (370, 1226))).astype(np.uint8)
        cv2.imwrite(os.path.join(root, "image_0", f"{i:06d}.png"), img)
        cv2.imwrite(os.path.join(root, "image_1", f"{i:06d}.png"), img)
    fx, cx, cy, b = 718.856, 607.1928, 185.2157, 0.5371657
    with open(os.path.join(root, "calib.txt"), "w") as f:
        f.write(f"P0: {fx} 0 {cx} 0 0 {fx} {cy} 0 0 0 1 0\n")
        f.write(f"P1: {fx} 0 {cx} {-fx*b} 0 {fx} {cy} 0 0 0 1 0\n")
    poses = []
    for i in range(3):
        P = np.eye(4)[:3]
        P[2, 3] = i * 1.0
        poses.append(P.reshape(-1))
    np.savetxt(os.path.join(root, "poses.txt"), np.stack(poses))


def test_kitti_loader(tmp_path):
    root = str(tmp_path / "seq")
    _write_kitti_fixture(root)
    seq = KittiSequence(root, (384, 1280),
                        poses_path=os.path.join(root, "poses.txt"))
    assert len(seq) == 3
    assert abs(float(seq.cam.fx) - 718.856) < 1e-3
    assert abs(float(seq.cam.baseline) - 0.5371657) < 1e-4
    assert seq.gt.shape == (3, 4, 4)
    assert seq.gt[2, 2, 3] == 2.0
    frames = list(seq.frames())
    assert frames[0][0].shape == (384, 1280)
    assert frames[0][0].max() <= 1.0
    # padding region is zero
    assert frames[0][0][:, 1226:].max() == 0.0


def test_pad_to_canvas():
    img = np.ones((370, 1226), np.float32)
    out = pad_to_canvas(img, 384, 1280)
    assert out.shape == (384, 1280)
    assert out[:370, :1226].min() == 1.0
    assert out[370:].max() == 0.0
