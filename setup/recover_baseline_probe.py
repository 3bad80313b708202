"""Recover the baseline arm of the stage-1 conditioning A/B from its
on-disk checkpoints after the round-5 OOM kill (the training process died
at step ~1950/2500; checkpoints through 1750 and their _log.json metric
histories survived).  Probes every saved checkpoint in a fresh process and
merges the row into the A/B evidence JSON with an honest truncation note.

Usage:
  python setup/recover_baseline_probe.py \
      --arm_dir /tmp/ab_stage1_conditioning/baseline \
      --out docs/evidence_stage1_conditioning_ab.json
"""
from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> None:
    from confignet_tpu.core.profiling import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--arm_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--arm_name", default="baseline")
    p.add_argument("--probe_batch", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from confignet_tpu.core.randomness import initialize_random_seed

    from probe_conditioning import HAIR_VALUES, _checkpoints, probe_checkpoint

    initialize_random_seed(args.seed)

    ckpt_dir = os.path.join(args.arm_dir, "checkpoints")
    rows = []
    last_log = None
    for ckpt in _checkpoints(ckpt_dir):
        row = probe_checkpoint(ckpt, "head_hair_color", HAIR_VALUES,
                               args.probe_batch, args.seed)
        rows.append(row)
        print(json.dumps(row))
        log_path = os.path.splitext(ckpt)[0] + "_log.json"
        if os.path.exists(log_path):
            last_log = log_path

    fid = []
    if last_log:
        with open(last_log) as fp:
            fid = [round(float(v), 4)
                   for v in json.load(fp).get("metrics", {}).get("fid", [])]

    with open(args.out) as fp:
        result = json.load(fp)
    result["arms"][args.arm_name] = {
        "overrides": {},
        "n_images": 1024,
        "fid": fid,
        "trajectory": rows,
        "note": ("training OOM-killed at step ~1950/2500 (leak fixed in "
                 "probe_conditioning since); rows cover the surviving "
                 "checkpoints, FID from the last checkpoint's log"),
    }
    with open(args.out, "w") as fp:
        json.dump(result, fp, indent=2)
    print("merged", args.arm_name, "into", args.out)


if __name__ == "__main__":
    import sys

    _here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, _here)
    sys.path.insert(0, os.path.dirname(_here))
    main()
