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
    return p.parse_args(argv)


def main(argv=None) -> None:
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
    model = ConfigNetFirstStage(config)

    out_dir = os.path.abspath(args.out)
    log_dir = os.path.join(out_dir, "logs")
    os.makedirs(out_dir, exist_ok=True)
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

    with open(os.path.join(out_dir, "quality_trend.json"), "w") as fp:
        json.dump(trend, fp, indent=2)
    print(json.dumps({k: trend[k] for k in ("steps", "wall_seconds",
                                            "steps_per_sec", "fid", "kid")}))
    if args.stage2_steps:
        print(json.dumps({"stage2": {k: trend["stage2"][k] for k in
                                     ("steps", "wall_seconds", "steps_per_sec",
                                      "fid", "kid")}}))


if __name__ == "__main__":
    main()
