"""Re-run the Table-2 controllability protocol against a SAVED stage-2
checkpoint (from a prior run_quality_evidence.py chain), retraining the
procedural attribute judge from scratch.

Exists so judge-side fixes (e.g. the round-4 label/render agreement fix in
data/procedural.py) can be re-evaluated without re-training the GAN chain.
Reference counterpart: evaluation/evaluate_confignet_controllability.py —
which likewise evaluates a saved model.

Usage:
  python setup/rerun_controllability.py --checkpoint /tmp/q/stage2/checkpoints/001250.json \
      --out /tmp/contr_rerun --samples 64
"""
from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None) -> None:
    from confignet_tpu.core.profiling import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True, help="stage-2 model .json")
    p.add_argument("--out", required=True)
    p.add_argument("--samples", type=int, default=64)
    p.add_argument("--n_images", type=int, default=1024)
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--classifier_epochs", type=int, default=6)
    p.add_argument("--classifier_steps_per_epoch", type=int, default=32)
    p.add_argument("--classifier_lr", type=float, default=0.001)
    p.add_argument("--judge_dir", default=None,
                   help="reuse an already-trained judge (dir of json+npz "
                        "checkpoints, e.g. a best_model dir) instead of "
                        "retraining one")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--samples_seed_offset", type=int, default=1,
                   help="held-out set seed = --seed + this")
    args = p.parse_args(argv)

    from confignet_tpu.core.randomness import initialize_random_seed

    initialize_random_seed(args.seed)

    from confignet_tpu.core.model_io import load_confignet
    from confignet_tpu.data.procedural import ProceduralFaceDataset
    from confignet_tpu.metrics.controllability import ControllabilityMetrics
    from run_quality_evidence import _train_procedural_judge

    model = load_confignet(args.checkpoint)
    os.makedirs(args.out, exist_ok=True)
    if args.judge_dir:
        import glob

        from confignet_tpu.metrics.celeba_attribute_prediction import (
            CelebaAttributeClassifier,
        )

        judge_json = sorted(glob.glob(os.path.join(args.judge_dir, "*.json")))[-1]
        clf = CelebaAttributeClassifier.load(judge_json)
        judge_acc = float(clf.logs.get("val_binary_accuracy", [-1.0])[-1])
        print(f"reusing judge {judge_json} (val acc {judge_acc:.3f})")
    else:
        ds = ProceduralFaceDataset(n_images=args.n_images,
                                   img_size=args.img_size, seed=args.seed)
        clf, judge_acc = _train_procedural_judge(
            ds, args.out, args.classifier_epochs, args.img_size,
            steps_per_epoch=args.classifier_steps_per_epoch,
            lr=args.classifier_lr)
    held_out = ProceduralFaceDataset(
        n_images=args.samples, img_size=args.img_size,
        seed=args.seed + args.samples_seed_offset)
    metrics_obj = ControllabilityMetrics(model, clf)
    history = {"training_step_number": [model.get_training_step_number()]}
    t0 = time.time()
    metrics_obj.update_and_log_metrics(held_out.imgs, history, args.out)
    result = {
        "checkpoint": args.checkpoint,
        "judge_val_accuracy": round(judge_acc, 4),
        "n_samples": args.samples,
        "wall_seconds": round(time.time() - t0, 1),
        "controllability": float(history["controllability"][-1]),
        "contr_attribute_means": [
            round(float(v), 4) for v in history["contr_attribute_means"][-1]
        ],
    }
    with open(os.path.join(args.out, "controllability_rerun.json"), "w") as fp:
        json.dump(result, fp, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    import sys

    # Scripts under setup/ get setup/ (not the repo root) as sys.path[0];
    # add both so `confignet_tpu` and the sibling run_quality_evidence
    # resolve when invoked as `python setup/rerun_controllability.py`.
    _here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, _here)
    sys.path.insert(0, os.path.dirname(_here))
    main()
