"""2-process jax.distributed test of the multi-host data path.

SCALING.md's multi-host section claims each host gathers only its local
shard; this test executes that contract for real across two OS processes
(CPU backend, 2 virtual devices each) — per-process row slicing, global
array assembly, and a cross-host collective reduction."""
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_data_path():
    port = _free_port()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(repo_root, "tests", "multihost_child.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, child, str(i), "2", str(port)],
            cwd=repo_root, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outputs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-host child processes timed out:\n" + "\n".join(outputs))

    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"MULTIHOST_OK {i}" in out, out


@pytest.mark.slow
def test_two_process_trainer_step():
    """A REAL stage-1 fused step across two OS processes: the trainer's own
    per-host sampler feeds the sharded step, each host staging only its
    rows; the gradient psums ride the collective mesh."""
    port = _free_port()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(repo_root, "tests", "multihost_child.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("CONFIGNET_TPU_INIT_CACHE", "/tmp/confignet_init_cache")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

    procs = [
        subprocess.Popen(
            [sys.executable, child, str(i), "2", str(port), "--trainer-step"],
            cwd=repo_root, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1500)
            outputs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-host trainer-step children timed out:\n" + "\n".join(outputs))

    losses = set()
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK {i}" in out, out[-2000:]
        for line in out.splitlines():
            if line.startswith("TRAINER_STEP_OK"):
                losses.add(line.split()[2])
    # both processes computed the SAME global loss (replicated result)
    assert len(losses) == 1, losses
