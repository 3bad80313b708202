"""Isolate WHY controllability reads null even when the hair-color splice
visibly moves pixels (round-5 chain: pixel_delta ~4.6 uint8 levels but
mean_set 0.4129 vs mean_other 0.4136).

Two independent suspects, measured separately:

  (a) JUDGE SENSITIVITY — per-attribute discrimination of the trained
      procedural judge on clean GT renders (mean predicted probability for
      label=1 vs label=0 rows + accuracy at 0.5).  If the judge cannot
      separate hair colors on ground truth, no generator splice can score.
  (b) SPLICE RESPONSE — encode held-out faces with the stage-2 model,
      splice each protocol hair anchor, decode, and classify: the judged
      P(attr) per spliced anchor, vs the unspliced decode, vs GT renders
      of faces that truly have that attribute.

Usage:
  python setup/diagnose_judge.py \
      --judge_dir /tmp/quality_r5/attribute_classifier/best_model \
      --checkpoint /tmp/quality_r5/stage2/checkpoints/000500.json \
      --out docs/evidence_judge_diagnosis.json
"""
from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def main(argv=None) -> None:
    from confignet_tpu.core.profiling import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--judge_dir", required=True,
                   help="dir of judge checkpoints (json+npz pairs)")
    p.add_argument("--checkpoint", required=True, help="stage-2 model .json")
    p.add_argument("--out", required=True)
    p.add_argument("--n_gt", type=int, default=256)
    p.add_argument("--n_encode", type=int, default=32)
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from confignet_tpu.core.randomness import initialize_random_seed

    initialize_random_seed(args.seed)

    from confignet_tpu.core.model_io import load_confignet
    from confignet_tpu.data.procedural import (
        ATTRIBUTE_NAMES,
        HAIR_COLOR_ANCHORS,
        ProceduralFaceDataset,
    )
    from confignet_tpu.metrics.celeba_attribute_prediction import (
        CelebaAttributeClassifier,
    )

    judge_json = sorted(glob.glob(os.path.join(args.judge_dir, "*.json")))[-1]
    clf = CelebaAttributeClassifier.load(judge_json)
    attr_names = clf.config["predicted_attributes"]

    # ---- (a) judge sensitivity on clean GT renders (held-out seed) ----
    ds = ProceduralFaceDataset(n_images=args.n_gt, img_size=args.img_size,
                               seed=args.seed + 1)
    labels = np.array(
        [[ds.attributes[i][name] for name in attr_names]
         for i in range(len(ds.attributes))], np.float32)
    preds = clf.predict_attributes(ds.imgs)
    judge = {}
    for j, name in enumerate(attr_names):
        pos, neg = preds[labels[:, j] == 1, j], preds[labels[:, j] == 0, j]
        judge[name] = {
            "n_pos": int((labels[:, j] == 1).sum()),
            "mean_pred_pos": round(float(pos.mean()), 4) if len(pos) else None,
            "mean_pred_neg": round(float(neg.mean()), 4) if len(neg) else None,
            "acc@0.5": round(float(((preds[:, j] > 0.5) == labels[:, j]).mean()), 4),
        }
        print(name, judge[name])

    # ---- (b) splice response of the stage-2 model ----
    model = load_confignet(args.checkpoint)
    imgs = ds.imgs[: args.n_encode]
    latents, rotations = model.encode_images(imgs)
    base_preds = clf.predict_attributes(model.generate_images(latents, rotations))
    splice = {"unspliced_decode": {
        name: round(float(base_preds[:, attr_names.index(name)].mean()), 4)
        for name in HAIR_COLOR_ANCHORS}}
    for anchor_name, value in HAIR_COLOR_ANCHORS.items():
        spliced = model.set_facemodel_param_in_latents(
            latents, "head_hair_color", np.asarray(value, np.float32))
        gen = model.generate_images(spliced, rotations)
        sp_preds = clf.predict_attributes(gen)
        splice[f"spliced_{anchor_name}"] = {
            name: round(float(sp_preds[:, attr_names.index(name)].mean()), 4)
            for name in HAIR_COLOR_ANCHORS}
        print(anchor_name, splice[f"spliced_{anchor_name}"])

    # GT reference: what the judge says on real renders per hair label
    gt_ref = {}
    for name in HAIR_COLOR_ANCHORS:
        j = attr_names.index(name)
        rows = labels[:, j] == 1
        if rows.any():
            gt_ref[name] = {
                other: round(float(preds[rows, attr_names.index(other)].mean()), 4)
                for other in HAIR_COLOR_ANCHORS}
    result = {"judge_gt_sensitivity": judge, "splice_response": splice,
              "judge_on_gt_by_true_hair": gt_ref,
              "checkpoint": args.checkpoint, "judge": judge_json}
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as fp:
        json.dump(result, fp, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    import sys

    _here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, _here)
    sys.path.insert(0, os.path.dirname(_here))
    main()
