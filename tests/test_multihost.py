"""Multi-PROCESS distributed execution (the DCN path).

Runs tools/multihost_smoke.py: two local CPU processes brought up via
jax.distributed.initialize against a localhost coordinator, pooling
2 virtual devices each into a 4-device global mesh and running
distributed_bundle_adjust ACROSS the process boundary with single-chip
parity asserted in each child. This is the standard fake-multihost
harness (SURVEY.md §4); the reference has no distributed execution at
all (its transport is ourCache/ text files, SURVEY.md §2).
"""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TOOL = os.path.join(_REPO, "tools", "multihost_smoke.py")


@pytest.mark.slow
def test_two_process_distributed_ba():
    try:
        proc = subprocess.run([sys.executable, _TOOL], cwd=_REPO,
                              capture_output=True, text=True, timeout=540)
    except (OSError, subprocess.TimeoutExpired) as e:
        pytest.skip(f"cannot spawn multi-process smoke here: {e}")
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert proc.returncode == 0, (
        f"multihost smoke failed rc={proc.returncode}:\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
    out = json.loads(line[-1])
    assert out["ok"]
    assert out["processes"] == 2
    assert out["global_devices"] == 4
    for child in out["children"]:
        assert child["ba_parity_terr"] < 5e-3
