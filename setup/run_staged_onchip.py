"""Run every TPU-blocked staged experiment (docs/ROADMAP.md item 6) in
sequence the moment a chip answers, logging each to its own file.

The axon tunnel has been observed to wedge for hours (jax.devices()
blocking forever); this runner exists so that when the chip comes back —
possibly while no interactive session is alive — one command drains the
whole staged queue and leaves artifacts on disk:

  python setup/run_staged_onchip.py --out /tmp/staged_onchip

Order (cheapest first, so partial completion still yields data):
  1. make test-tpu                  — re-pin hardware goldens post interpret-flag
  2. setup/exp_conv3d_standalone.py — conv3d lowering A/B, shapes A/B/C
  3. setup/exp_conv3d_inmodel.py    — conv3d lowering A/B in-model, B=256 bf16
  4. bench.py                       — fresh headline sample with the x-slab kernel
  5. setup/run_quality_evidence.py  — short stage-1 + stage-2 quality trend

Each step gets a timeout; a failure records the log and moves on.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def wait_for_device(timeout_s: float) -> bool:
    """Poll jax.devices() in a subprocess (it can block forever in-process)."""
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; print(jax.devices())"],
                capture_output=True, text=True, timeout=90, cwd=REPO,
                check=False,
            )
        except subprocess.TimeoutExpired:
            probe = None
        if probe is not None and probe.returncode == 0 and "Tpu" in probe.stdout:
            print(f"device up: {probe.stdout.strip()}", flush=True)
            return True
        print(f"device still down at {time.strftime('%H:%M:%S')}", flush=True)
        time.sleep(120)
    return False


def run_step(name: str, cmd: list[str], out_dir: str, timeout_s: float) -> dict:
    log_path = os.path.join(out_dir, f"{name}.log")
    print(f"=== {name}: {' '.join(cmd)} (timeout {int(timeout_s)}s)", flush=True)
    t0 = time.monotonic()
    # Scripts under setup/ get setup/ (not the repo root) as sys.path[0];
    # export the root so `import confignet_tpu` works without installation.
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    with open(log_path, "w") as log:
        try:
            proc = subprocess.run(
                cmd, stdout=log, stderr=subprocess.STDOUT,
                timeout=timeout_s, cwd=REPO, check=False, env=env,
            )
            rc = proc.returncode
        except subprocess.TimeoutExpired:
            rc = -1
    dt = time.monotonic() - t0
    print(f"=== {name}: rc={rc} in {dt:.0f}s -> {log_path}", flush=True)
    return {"name": name, "rc": rc, "seconds": round(dt, 1), "log": log_path}


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/staged_onchip")
    p.add_argument("--wait_s", type=float, default=0,
                   help="poll for a device this long before starting (0 = "
                        "assume it's up)")
    p.add_argument("--quality_steps", type=int, default=500)
    p.add_argument("--quality_stage2_steps", type=int, default=300)
    p.add_argument("--skip", default="",
                   help="comma-separated step names to skip")
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    if args.wait_s and not wait_for_device(args.wait_s):
        print("device never answered; nothing run", flush=True)
        sys.exit(3)

    py = sys.executable
    steps = [
        ("test_tpu", ["make", "test-tpu"], 1800),
        ("conv3d_standalone", [py, "setup/exp_conv3d_standalone.py"], 1200),
        ("conv3d_inmodel", [py, "setup/exp_conv3d_inmodel.py"], 1200),
        ("bench", [py, "bench.py"], 1200),
        ("quality", [py, "setup/run_quality_evidence.py",
                     "--out", os.path.join(args.out, "quality"),
                     "--steps", str(args.quality_steps),
                     "--stage2_steps", str(args.quality_stage2_steps)], 7200),
    ]
    skip = {s for s in args.skip.split(",") if s}
    results = [run_step(n, c, args.out, t) for n, c, t in steps if n not in skip]
    summary = os.path.join(args.out, "summary.json")
    with open(summary, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)
    print(f"summary -> {summary}", flush=True)


if __name__ == "__main__":
    main()
