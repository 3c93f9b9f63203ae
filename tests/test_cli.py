"""CLI surface tests (SURVEY C24: the `slam` driver entry points).

Covers the reference's three process entries — `python main.py` (run),
`python BundleAdjustment.py` (ba), and the MATLAB eval scripts (eval) —
through the packaged CLI, including the distributed global-BA path on
the virtual 8-device CPU mesh.
"""

import json
import os

import numpy as np
import pytest

from slam1_tpu import cli


def _run_cli(capsys, argv):
    rc = cli.main(argv)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1]) if out else {}


def test_run_synthetic_and_eval(tmp_path, capsys):
    traj = str(tmp_path / "traj.npy")
    res = _run_cli(capsys, [
        "run", "--synthetic", "24", "--trajectory", "loop", "--tiny",
        "--out", traj, "--log-every", "100"])
    assert res["frames"] == 24
    assert res["ate_rmse_m"] < 2.0
    assert os.path.exists(traj)


def test_ba_state_global_and_distributed(tmp_path, capsys):
    import jax

    from slam1_tpu.config import tiny_config
    from slam1_tpu.models import pipeline
    from slam1_tpu.utils.synthetic import make_world, render_sequence

    cfg = tiny_config()
    world = make_world(jax.random.PRNGKey(5), n_frames=16, n_points=1200,
                       trajectory="arc",
                       image_hw=(cfg.image.height, cfg.image.width))
    L, R = render_sequence(world, cfg.image.height, cfg.image.width)
    sys_ = pipeline.SlamSystem(world.cam, cfg, bow_train_frame=6)
    for i in range(16):
        sys_.process(L[i], R[i])
    sys_.finalize()
    ckpt = str(tmp_path / "state.npz")
    sys_.save_checkpoint(ckpt)

    out1 = str(tmp_path / "opt1.npy")
    res1 = _run_cli(capsys, ["ba", "--state", ckpt, "--tiny",
                             "--iters", "4", "--out", out1])
    assert res1["keyframes"] == 16
    assert np.isfinite(res1["final_cost"])

    out2 = str(tmp_path / "opt2.npy")
    res2 = _run_cli(capsys, ["ba", "--state", ckpt, "--tiny",
                             "--iters", "4", "--distributed",
                             "--lm-shards", "4", "--out", out2])
    assert res2["mesh"]["lm"] == 4
    assert res2["dropped_obs"] == 0
    assert np.isfinite(res2["final_cost"])
    # Distributed solve must agree with the single-chip solve.
    p1, p2 = np.load(out1), np.load(out2)
    assert np.abs(p1[:, :3, 3] - p2[:, :3, 3]).max() < 2e-2


def test_eval_cmd(tmp_path, capsys):
    rng = np.random.default_rng(0)
    est = np.tile(np.eye(4, dtype=np.float32), (10, 1, 1))
    est[:, 2, 3] = np.arange(10)
    gt = est.copy()
    gt[:, 0, 3] += rng.normal(0, 0.01, 10)
    e_p, g_p = str(tmp_path / "est.npy"), str(tmp_path / "gt.npy")
    np.save(e_p, est)
    np.save(g_p, gt)
    res = _run_cli(capsys, ["eval", e_p, g_p, "--no-align"])
    assert res["ate_rmse_m"] < 0.05
