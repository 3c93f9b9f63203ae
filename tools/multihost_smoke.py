"""Two-process distributed smoke test for the DCN path.

Executes the multi-PROCESS code path for real (SURVEY.md §7 step 8 /
§4's fake-multihost harness): the parent spawns two local CPU processes
that call `init_multihost` against a localhost coordinator
(`jax.distributed.initialize`), pool their virtual devices into one
global mesh, and run `distributed_bundle_adjust` across the process
boundary — proving the plumbing that on a TPU pod rides DCN between
hosts. Parity vs the single-chip solver is asserted inside each child.

The reference has no distributed execution of any kind (SURVEY.md §2:
its inter-process transport is text files in ourCache/); this is a
new-capability artifact, not a port.

Usage:
  python tools/multihost_smoke.py            # parent: spawn + verify
  python tools/multihost_smoke.py --child I  # internal

Prints one JSON line on success:
  {"ok": true, "processes": 2, "global_devices": 4, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

DEVS_PER_PROC = 2
NUM_PROCS = 2


def _child(process_id: int, coord: str) -> int:
    import numpy as np

    import jax

    from slam1_tpu.parallel.mesh import init_multihost, make_mesh

    init_multihost(coordinator_address=coord, num_processes=NUM_PROCS,
                   process_id=process_id)
    assert jax.process_count() == NUM_PROCS, jax.process_count()
    assert jax.local_device_count() == DEVS_PER_PROC
    n_global = len(jax.devices())
    assert n_global == NUM_PROCS * DEVS_PER_PROC, n_global

    from __graft_entry__ import _synthetic_ba_problem
    from slam1_tpu.config import BAConfig
    from slam1_tpu.models.ba import BAProblem, bundle_adjust
    from slam1_tpu.ops import se3
    from slam1_tpu.ops.camera import StereoCamera, project_world
    from slam1_tpu.parallel.dist_ba import (distributed_bundle_adjust,
                                            partition_problem)

    # Identical problem on every process (same seed): numpy inputs to a
    # multi-process jit are treated as REPLICATED global values, and
    # shard_map reshards them onto the lm axis — which here spans the
    # process boundary.
    cam = StereoCamera.kitti_default()
    prob = _synthetic_ba_problem(np.random.default_rng(0), cam, 4, 64,
                                 se3, project_world, BAProblem)
    ba_cfg = BAConfig(lm_iters=2, cg_iters=8)
    mesh = make_mesh(n_global, lm_axis=n_global)  # lm spans both procs
    sharded, _ = partition_problem(prob, n_global)
    sharded = jax.tree.map(np.asarray, sharded)   # keep inputs host-side

    out, cost = distributed_bundle_adjust(sharded, cam, ba_cfg, mesh)
    # out.poses is replicated -> addressable everywhere; compare with the
    # process-local single-chip solve.
    ref_out, ref_cost = bundle_adjust(prob, cam, ba_cfg)
    poses = np.asarray(out.poses)
    terr = float(np.abs(poses[:, :3, 3]
                        - np.asarray(ref_out.poses[:, :3, 3])).max())
    assert np.isfinite(float(cost)), "distributed BA produced NaN cost"
    assert terr < 5e-3, f"multi-process BA diverges: {terr}"

    print(json.dumps({
        "child": process_id, "processes": jax.process_count(),
        "global_devices": n_global,
        "local_devices": jax.local_device_count(),
        "mesh": {k: int(v) for k, v in mesh.shape.items()},
        "ba_cost": float(cost), "ba_parity_terr": terr}))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--coord", type=str, default=None)
    args = ap.parse_args()
    if args.child is not None:
        return _child(args.child, args.coord)

    # Pick a free port for the coordinator.
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count="
                        f"{DEVS_PER_PROC}").strip()
    # The axon sitecustomize (remote-TPU tunnel) initializes JAX
    # backends at interpreter start, which turns a later
    # jax.distributed.initialize into a silent no-op — children must
    # start with a clean CPU-only interpreter.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon" not in p]
    if pp:
        env["PYTHONPATH"] = os.pathsep.join(pp)
    else:
        env.pop("PYTHONPATH", None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", str(i),
         "--coord", coord],
        env=env, cwd=_REPO, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for i in range(NUM_PROCS)]
    outs = []
    ok = True
    for i, p in enumerate(procs):
        try:
            so, se = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            so, se = p.communicate()
            ok = False
        if p.returncode != 0:
            ok = False
            print(f"--- child {i} rc={p.returncode} stderr tail ---\n"
                  + "\n".join(se.splitlines()[-15:]), file=sys.stderr)
        for line in so.splitlines():
            if line.startswith("{"):
                outs.append(json.loads(line))
    ok = ok and len(outs) == NUM_PROCS
    result = {"ok": ok,
              "processes": outs[0]["processes"] if outs else 0,
              "global_devices": outs[0]["global_devices"] if outs else 0,
              "children": outs}
    print(json.dumps(result))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
