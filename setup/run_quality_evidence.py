"""Training-quality evidence run (VERDICT r2 item 3 / item 6).

Trains stage 1 at reference scale (256px, batch 24, 5 discriminator
layers, bf16) on the procedural face dataset (data/procedural.py) with
FID/KID evaluated on a cadence and image panels written, then dumps the
metric trend to JSON so the declining-FID curve can be committed to
docs/TEST_RUNS.md.

Caveats stated up front (both inherited from the zero-egress rig, not the
framework): the perceptual loss runs on RANDOM VGG weights (random-feature
perceptual distance — still a valid training signal, but absolute quality
is capped), and FID/KID use a random-init InceptionV3 feature space
(random-feature FID; trends remain meaningful because GT and generated
features share the extractor).

Usage:
  python setup/run_quality_evidence.py --steps 4000 --out /tmp/quality_run
  python setup/run_quality_evidence.py --steps 2000 --r1_heads final ...  # A/B
"""
from __future__ import annotations

import argparse
import json
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--n_images", type=int, default=1024)
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=24)
    p.add_argument("--metrics_period", type=int, default=500)
    p.add_argument("--image_period", type=int, default=500)
    p.add_argument("--n_samples_for_metrics", type=int, default=256)
    p.add_argument("--r1_heads", default="all", choices=["all", "final"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--stage2_steps", type=int, default=0,
                   help="after stage 1, transfer weights into the stage-2 "
                        "trainer (encoder joins the G player) and train this "
                        "many steps with the same FID/KID cadence")
    p.add_argument("--latent_gan_steps", type=int, default=0,
                   help="after stage 2, train a LatentGAN on the encoder's "
                        "latents (the reference's third training phase)")
    p.add_argument("--controllability_samples", type=int, default=0,
                   help="run the Table-2 controllability protocol on this "
                        "many held-out procedural faces, judged by an "
                        "attribute classifier trained on the procedural "
                        "labels (requires --stage2_steps)")
    p.add_argument("--classifier_epochs", type=int, default=6)
    p.add_argument("--classifier_steps_per_epoch", type=int, default=32)
    p.add_argument("--classifier_lr", type=float, default=0.001)
    p.add_argument("--config_override", default=None,
                   help="JSON dict merged over the stage-1 config (e.g. the "
                        "winning ab_stage1_conditioning arm)")
    p.add_argument("--stage1_checkpoint", default=None,
                   help="skip stage-1 training: load this saved stage-1 "
                        "model .json (e.g. an ab_stage1_conditioning arm "
                        "checkpoint) and run the rest of the chain from it")
    p.add_argument("--stage2_config_override", default=None,
                   help="JSON dict merged over the stage-2 config AFTER the "
                        "x10 image-loss multiplication")
    return p.parse_args(argv)


def _train_procedural_judge(ds, out_dir, epochs, img_size,
                            steps_per_epoch=32, lr=0.001):
    """Attribute classifier on the procedural faces + derived labels — the
    judge for the controllability protocol (reference counterpart:
    evaluation/train_attribute_classifier.py on CelebA)."""
    from confignet_tpu.data.procedural import ATTRIBUTE_NAMES
    from confignet_tpu.metrics.celeba_attribute_prediction import (
        CelebaAttributeClassifier,
    )

    clf = CelebaAttributeClassifier({
        "input_shape": (img_size, img_size, 3),
        "predicted_attributes": list(ATTRIBUTE_NAMES),
        "batch_size": 32,
        "optimizer": {"lr": lr},
        # from-scratch recipe: live trunk BN + fast-tracking head BN
        "trainable_bn": True,
        "head_bn_momentum": 0.9,
    })
    clf_dir = os.path.join(out_dir, "attribute_classifier")
    clf.train(ds, ds, clf_dir, n_epochs=epochs, steps_per_epoch=steps_per_epoch)
    acc = float(clf.logs["val_binary_accuracy"][-1])
    print(f"procedural judge val accuracy: {acc:.3f}")
    return clf, acc


def main(argv=None) -> None:
    from confignet_tpu.core.profiling import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    args = parse_args(argv)
    from confignet_tpu.core.randomness import initialize_random_seed

    initialize_random_seed(args.seed)

    from confignet_tpu.data.procedural import ProceduralFaceDataset
    from confignet_tpu.training.first_stage import ConfigNetFirstStage

    t0 = time.time()
    ds = ProceduralFaceDataset(n_images=args.n_images, img_size=args.img_size,
                               seed=args.seed)
    print(f"rendered {args.n_images} procedural faces in {time.time()-t0:.1f}s")

    config = {
        "output_shape": (args.img_size, args.img_size, 3),
        "n_discr_layers": 5,
        "batch_size": args.batch_size,
        "compute_dtype": args.compute_dtype,
        "facemodel_inputs": ds.facemodel_inputs_config(),
        "metrics_checkpoint_period": args.metrics_period,
        "image_checkpoint_period": args.image_period,
        "r1_heads": args.r1_heads,
        "seed": args.seed,
    }
    if args.config_override:
        config.update(json.loads(args.config_override))

    out_dir = os.path.abspath(args.out)
    log_dir = os.path.join(out_dir, "logs")
    os.makedirs(out_dir, exist_ok=True)
    if args.stage1_checkpoint:
        from confignet_tpu.core.model_io import load_confignet

        model = load_confignet(args.stage1_checkpoint)
        # Periods/config knobs still come from the CLI for the rest of
        # the chain (the checkpoint's json carries its training-time ones).
        model.config["metrics_checkpoint_period"] = args.metrics_period
        model.config["image_checkpoint_period"] = args.image_period
        config = dict(model.config)
        trend = {
            "config": {k: str(v) for k, v in config.items()},
            "stage1_checkpoint": args.stage1_checkpoint,
            "fid": [round(float(v), 4) for v in model.metrics.get("fid", [])],
            "kid": [round(float(v), 6) for v in model.metrics.get("kid", [])],
            "metrics_period": args.metrics_period,
        }
    else:
        model = ConfigNetFirstStage(config)
        t0 = time.time()
        model.train(ds, ds, out_dir, log_dir, n_steps=args.steps,
                    n_samples_for_metrics=args.n_samples_for_metrics)
        wall = time.time() - t0

        trend = {
            "config": {k: str(v) for k, v in config.items()},
            "steps": args.steps,
            "wall_seconds": round(wall, 1),
            "steps_per_sec": round(args.steps / wall, 3),
            "fid": [round(float(v), 4) for v in model.metrics.get("fid", [])],
            "kid": [round(float(v), 6) for v in model.metrics.get("kid", [])],
            "metrics_period": args.metrics_period,
            "final_losses": {
                "g_loss_sum": float(model.g_losses["loss_sum"][-1]),
                "d_loss_sum": float(model.d_losses["loss_sum"][-1]),
            },
        }
    if args.stage2_steps:
        # Stage 2: same dataset plays the "real" set (reference flow:
        # train_confignet.py stage 2 consumes a real dataset + the synth
        # one; confignet_second_stage.py:149-218).  Weights transfer via
        # the same get/set_weights path the CLI uses.
        from confignet_tpu.training.second_stage import ConfigNet

        config2 = dict(config)
        # The CLI multiplies image_loss_weight x10 for stage 2
        # (apps/train_confignet.py, matching reference train_confignet.py:66).
        config2["image_loss_weight"] = model.config["image_loss_weight"] * 10
        if args.stage2_config_override:
            config2.update(json.loads(args.stage2_config_override))
        model2 = ConfigNet(config2)
        model2.set_weights(model.get_weights())
        out2 = os.path.join(out_dir, "stage2")
        os.makedirs(out2, exist_ok=True)
        t0 = time.time()
        model2.train(ds, ds, validation_set=ds, output_dir=out2,
                     log_dir=os.path.join(out2, "logs"),
                     n_steps=args.stage2_steps,
                     n_samples_for_metrics=args.n_samples_for_metrics)
        wall2 = time.time() - t0
        trend["stage2"] = {
            "steps": args.stage2_steps,
            "wall_seconds": round(wall2, 1),
            "steps_per_sec": round(args.stage2_steps / wall2, 3),
            "fid": [round(float(v), 4) for v in model2.metrics.get("fid", [])],
            "kid": [round(float(v), 6) for v in model2.metrics.get("kid", [])],
            "perceptual_loss": [
                round(float(v), 4)
                for v in model2.metrics.get("perceptual_loss", [])
            ],
            "final_losses": {
                "g_loss_sum": float(model2.g_losses["loss_sum"][-1]),
                "d_loss_sum": float(model2.d_losses["loss_sum"][-1]),
            },
        }

        if args.latent_gan_steps:
            # Third training phase: LatentGAN over the encoder's latent
            # space (reference: train_latent_gan.py -> latent_gan.py:83-150).
            from confignet_tpu.training.latent_gan import LatentGAN

            gan = LatentGAN({
                "latent_dim": model2.config["latent_dim"],
                "batch_size": 32,
                "n_samples_for_metrics": min(args.n_samples_for_metrics, 256),
            })
            gan_dir = os.path.join(out_dir, "latent_gan")
            t0 = time.time()
            gan.train(ds, model2, gan_dir, os.path.join(gan_dir, "logs"),
                      n_iters=args.latent_gan_steps)
            trend["latent_gan"] = {
                "steps": args.latent_gan_steps,
                "wall_seconds": round(time.time() - t0, 1),
                "fid": [round(float(v), 4) for v in gan.metrics.get("fid", [])],
                "kid": [round(float(v), 6) for v in gan.metrics.get("kid", [])],
            }
            gan.save(os.path.join(gan_dir, "checkpoints"), "final")

        if args.controllability_samples:
            # Table-2 controllability protocol on held-out procedural faces,
            # judged by a classifier trained on the procedural labels
            # (reference: evaluation/evaluate_confignet_controllability.py).
            from confignet_tpu.metrics.controllability import ControllabilityMetrics

            clf, judge_acc = _train_procedural_judge(
                ds, out_dir, args.classifier_epochs, args.img_size,
                steps_per_epoch=args.classifier_steps_per_epoch,
                lr=args.classifier_lr)
            held_out = ProceduralFaceDataset(
                n_images=args.controllability_samples,
                img_size=args.img_size, seed=args.seed + 1)
            contr_dir = os.path.join(out_dir, "controllability")
            metrics_obj = ControllabilityMetrics(model2, clf)
            history = {"training_step_number": [args.stage2_steps]}
            t0 = time.time()
            metrics_obj.update_and_log_metrics(held_out.imgs, history, contr_dir)
            trend["controllability"] = {
                "judge_val_accuracy": round(judge_acc, 4),
                "n_samples": args.controllability_samples,
                "wall_seconds": round(time.time() - t0, 1),
                "controllability": float(history["controllability"][-1]),
                "contr_attribute_means": [
                    round(float(v), 4)
                    for v in history["contr_attribute_means"][-1]
                ],
            }

    with open(os.path.join(out_dir, "quality_trend.json"), "w") as fp:
        json.dump(trend, fp, indent=2)
    print(json.dumps({k: trend[k] for k in ("steps", "wall_seconds",
                                            "steps_per_sec", "fid", "kid")
                      if k in trend}))
    if args.stage2_steps:
        print(json.dumps({"stage2": {k: trend["stage2"][k] for k in
                                     ("steps", "wall_seconds", "steps_per_sec",
                                      "fid", "kid")}}))


if __name__ == "__main__":
    import sys

    _here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, _here)
    sys.path.insert(0, os.path.dirname(_here))
    main()
