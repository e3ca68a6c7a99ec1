"""Multi-JVM execution evidence (VERDICT r4 tasks #1/#2).

These tests run in SUBPROCESSES because a Python process can hold only
one SparkContext and the shared session fixture is ``local[4]`` — the
cluster drills need a ``local-cluster[n,c,m]`` master with separate
executor JVMs (real serialized shuffles, per-executor broadcasts,
executor LOSS as distinct from task failure).

The full-registry twin of these drills is
``scripts/check_oracles.py --master local-cluster[2,4,6144]``
(CORRECTNESS_CLUSTER.json: 129/129 exact under multi-JVM executors).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _run(script: str, env_extra: dict[str, str], timeout: int = 540):
    env = dict(os.environ, **env_extra)
    return subprocess.run(
        [sys.executable, str(REPO / "scripts" / script)],
        capture_output=True,
        text=True,
        cwd=str(REPO),
        env=env,
        timeout=timeout,
    )


def test_executor_loss_mid_wave_converges_to_clean_result():
    """SIGKILL one executor JVM (not a task) mid-wave: the job must
    complete on the surviving/replacement executor, commit each bucket
    exactly once, and produce a row-identical output table."""
    proc = _run("chaos_executor_loss.py", {"CHAOS_DOCS": "6000"})
    lines = [
        ln
        for raw in proc.stdout.splitlines()
        for ln in raw.split("\r")
        if ln.startswith(("RESULT ", "SKIP "))
    ]
    if not lines:
        pytest.fail(
            f"no RESULT/SKIP line (rc={proc.returncode}):\n"
            f"{proc.stderr[-2000:]}"
        )
    if lines[-1].startswith("SKIP"):
        pytest.skip(lines[-1])
    result = json.loads(lines[-1][len("RESULT "):])
    assert result["killed_executor_pid"], result
    assert result["ok"], result


def test_executor_loss_during_incremental_wave_commits_once():
    """Executor loss composed with the wave-incremental pipeline:
    SIGKILL an executor while wave 2's state-probing funnel runs —
    epoch 1 commits exactly once, row-identical to an undisturbed
    two-wave run."""
    proc = _run(
        "chaos_executor_loss.py",
        {"CHAOS_MODE": "wave", "CHAOS_DOCS": "6000"},
    )
    lines = [
        ln
        for raw in proc.stdout.splitlines()
        for ln in raw.split("\r")
        if ln.startswith(("RESULT ", "SKIP "))
    ]
    if not lines:
        pytest.fail(
            f"no RESULT/SKIP line (rc={proc.returncode}):\n"
            f"{proc.stderr[-2000:]}"
        )
    if lines[-1].startswith("SKIP"):
        pytest.skip(lines[-1])
    result = json.loads(lines[-1][len("RESULT "):])
    assert result["killed_executor_pid"], result
    assert result["ok"], result
