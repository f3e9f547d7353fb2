"""`ray job submit`-path smoke (round-4 verdict item #8): the exact module
a cluster submission runs (`python -m spiderray.run`), exercised in a FRESH
subprocess that owns its own 8-cpu session — the in-container stand-in for
one cluster node (MULTINODE.md documents the knobs that change at N/4N
nodes).  Verifies the job prints its summary JSON, writes per-partition
manifests, and that a resubmission (the preemption-recovery path) skips
every finished partition."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))


@pytest.mark.timeout(300)
def test_job_submit_payload_runs_and_resumes(tmp_path):
    out = str(tmp_path / "jobout")
    cmd = [sys.executable, "-m", "spiderray.run",
           "--input", "synth:3000", "--output", out,
           "--partitions", "6", "--num-cpus", "8", "--wide-rows"]
    env = dict(os.environ, RAY_ADDRESS="local")

    r1 = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                        text=True, timeout=280)
    assert r1.returncode == 0, r1.stderr[-2000:]
    s1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert s1["skipped"] == 0 and len(s1["completed"]) == 6
    assert s1["rows"] == 3000
    manifests = [f for f in os.listdir(out) if f.endswith(".json")]
    assert len(manifests) == 6

    # resubmission: everything already manifested -> all skipped
    r2 = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                        text=True, timeout=280)
    assert r2.returncode == 0, r2.stderr[-2000:]
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s2["skipped"] == 6 and s2["completed"] == [] and s2["rows"] == 0


def test_address_resolution_precedence(monkeypatch):
    """--address > RAY_ADDRESS > 'local' — exercises run.py's actual
    resolver (no session started)."""
    from spiderray.run import resolve_address

    monkeypatch.delenv("RAY_ADDRESS", raising=False)
    assert resolve_address(None) == "local"
    monkeypatch.setenv("RAY_ADDRESS", "ray://head:10001")
    assert resolve_address(None) == "ray://head:10001"
    assert resolve_address("auto") == "auto"
