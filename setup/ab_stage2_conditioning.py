"""Isolate the stage-2 conditioning-erosion mechanism with a targeted A/B.

The round-4 checkpoint probe (setup/probe_conditioning.py,
docs/evidence_conditioning_trajectory.json) showed the spliced hair-color
latent spread eroding during short stage-2 runs (0.45 -> 0.26 over 1250
steps).  Two mechanisms could drive that:

  a) the x10 ``image_loss_weight`` autoencode term dominating the G player
     (apps/train_confignet.py multiplies it, matching reference
     train_confignet.py:66), starving the synthetic-supervision losses, or
  b) the domain-adversarial latent GAN (reference
     confignet_second_stage.py:132-147) compressing the synthetic encoder's
     output so real-encoder and synth-encoder latents become
     indistinguishable.

This script resumes from a SAVED stage-1 checkpoint (no stage-1 retrain),
runs short stage-2 arms that vary exactly one weight each, then probes the
conditioning spread of every saved checkpoint with the same machinery as
probe_conditioning.py.  Output: one JSON with per-arm spread/pixel-delta
trajectories.

Usage:
  python setup/ab_stage2_conditioning.py \
      --stage1_checkpoint /tmp/quality_r4b/checkpoints/002250.json \
      --out docs/evidence_stage2_erosion_ab.json --steps 500
"""
from __future__ import annotations

import argparse
import json
import os
import time

ARMS = {
    # name -> config overrides applied on top of the stage-1 config after
    # the CLI's x10 image-loss multiplication.  The *_mult keys multiply the
    # INHERITED stage-1 value (the round-5 winning arm already carries
    # image_loss_weight x10 and latent_regression_weight x10, so absolute
    # values would silently no-op).
    "baseline_imgx10": {},
    "img_x1": {"image_loss_weight_mult": 0.1},
    "domain_adv_off": {"domain_adverserial_loss_weight": 0.0},
    # The latent-regression cycle loss (reference losses.py:85-90) is the
    # term that forces G to keep every latent slice pixel-visible — boost
    # it further to test whether it actively recovers conditioning.
    "latreg_boost": {"latent_regression_weight_mult": 10.0},
}


def run_arm(name, overrides, stage1_ckpt, ds, out_root, steps, metrics_period,
            n_samples_for_metrics):
    from confignet_tpu.core.model_io import load_confignet
    from confignet_tpu.training.second_stage import ConfigNet

    model1 = load_confignet(stage1_ckpt)
    config2 = dict(model1.config)
    # The CLI multiplies image_loss_weight x10 for stage 2
    # (apps/train_confignet.py, matching reference train_confignet.py:66).
    mult = 10.0 * overrides.pop("image_loss_weight_mult", 1.0)
    config2["image_loss_weight"] = model1.config["image_loss_weight"] * mult
    latreg_mult = overrides.pop("latent_regression_weight_mult", None)
    if latreg_mult is not None:
        config2["latent_regression_weight"] = (
            model1.config.get("latent_regression_weight", 10.0) * latreg_mult
        )
    config2["metrics_checkpoint_period"] = metrics_period
    config2["image_checkpoint_period"] = metrics_period
    config2.update(overrides)

    model2 = ConfigNet(config2)
    model2.set_weights(model1.get_weights())
    model2.facemodel_param_distributions = model1.facemodel_param_distributions

    arm_dir = os.path.join(out_root, name)
    os.makedirs(arm_dir, exist_ok=True)
    t0 = time.time()
    model2.train(ds, ds, validation_set=ds, output_dir=arm_dir,
                 log_dir=os.path.join(arm_dir, "logs"), n_steps=steps,
                 n_samples_for_metrics=n_samples_for_metrics)
    wall = time.time() - t0
    del model1, model2
    return arm_dir, wall


def main(argv=None) -> None:
    from confignet_tpu.core.profiling import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--stage1_checkpoint", required=True,
                   help="stage-1 model .json to transfer from")
    p.add_argument("--out", required=True, help="output JSON path")
    p.add_argument("--work_dir", default="/tmp/ab_stage2_erosion")
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--metrics_period", type=int, default=250)
    p.add_argument("--n_samples_for_metrics", type=int, default=64)
    p.add_argument("--n_images", type=int, default=1024)
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--probe_batch", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from confignet_tpu.core.randomness import initialize_random_seed

    initialize_random_seed(args.seed)

    from confignet_tpu.data.procedural import ProceduralFaceDataset
    from probe_conditioning import HAIR_VALUES, _checkpoints, probe_checkpoint

    t0 = time.time()
    ds = ProceduralFaceDataset(n_images=args.n_images, img_size=args.img_size,
                               seed=args.seed)
    print(f"rendered {args.n_images} procedural faces in {time.time()-t0:.1f}s")

    result = {
        "stage1_checkpoint": args.stage1_checkpoint,
        "steps": args.steps,
        "param": "head_hair_color",
        "arms": {},
    }
    for name, overrides in ARMS.items():
        print(f"=== arm {name}: overrides {overrides}")
        arm_dir, wall = run_arm(
            name, dict(overrides), args.stage1_checkpoint, ds,
            args.work_dir, args.steps, args.metrics_period,
            args.n_samples_for_metrics)
        rows = []
        for ckpt in _checkpoints(os.path.join(arm_dir, "checkpoints")):
            row = probe_checkpoint(ckpt, "head_hair_color", HAIR_VALUES,
                                   args.probe_batch, args.seed)
            rows.append(row)
            print(json.dumps(row))
        result["arms"][name] = {
            "overrides": overrides,
            "wall_seconds": round(wall, 1),
            "trajectory": rows,
        }
        # Persist incrementally so a dead tunnel still leaves partial data.
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
