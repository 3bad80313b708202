"""Stage-1 conditioning A/B: find a regime where attribute driving survives.

The round-4 checkpoint probe (docs/evidence_conditioning_trajectory.json)
showed the hair-color splice's pixel_delta eroding DURING STAGE 1 itself
(9.8 -> 1.8 uint8 levels over 2250 steps) while the synthetic encoder's
latent_spread held — i.e. the *generator* learns to under-use the attribute
slice as it sharpens onto the 1024-image procedural set.  Three stage-1
mechanisms could drive that:

  a) the param->pixel supervision (``image_loss_weight`` x perceptual loss on
     G(E_s(params)) vs GT, reference confignet_first_stage.py:300-318) is too
     weak to anchor the slice — especially under the rig's RANDOM-weight VGG,
     whose features carry far less color signal than the reference's
     pretrained VGGFace;
  b) the latent regression loss (reference losses.py:85-90, weight 10) — the
     term that forces G to keep every latent slice pixel-visible — is too
     weak relative to the adversarial losses;
  c) the generator memorizes the small (1024-image) set and drops latent
     use: more data forces it to keep reading the conditioning slices.

This script trains short stage-1 arms that vary exactly one knob each, then
probes the conditioning spread/pixel-delta of every saved checkpoint with
the same machinery as setup/probe_conditioning.py.  FID trends are recorded
per arm so a "win" on conditioning that destroys image quality is visible.
Output: one JSON with per-arm trajectories + FID.

Usage:
  python setup/ab_stage1_conditioning.py \
      --out docs/evidence_stage1_conditioning_ab.json --steps 2500
"""
from __future__ import annotations

import argparse
import json
import os
import time

ARMS = {
    # name -> (config overrides, dataset n_images multiplier)
    "baseline": ({}, 1),
    # Mechanism (a): x10 param->pixel supervision (0.00005 -> 0.0005).
    "imgloss_x10": ({"image_loss_weight": 0.0005}, 1),
    # Mechanism (b): x10 latent-visibility enforcement (10 -> 100).
    "latreg_x10": ({"latent_regression_weight": 100.0}, 1),
    # Mechanism (c): 4x data, same steps — less memorization pressure.
    "data_x4": ({}, 4),
    # (a)+(b) combined: the round-5 arms showed imgloss_x10 converging FID
    # fastest (0.45 @ 2250) and latreg_x10 retaining pixel_delta longest —
    # test whether the mechanisms stack.
    "imgloss_latreg_x10": (
        {"image_loss_weight": 0.0005, "latent_regression_weight": 100.0}, 1),
}


def make_dataset(n_images, img_size, seed):
    from confignet_tpu.data.procedural import ProceduralFaceDataset

    t0 = time.time()
    ds = ProceduralFaceDataset(n_images=n_images, img_size=img_size, seed=seed)
    print(f"rendered {n_images} procedural faces in {time.time()-t0:.1f}s")
    return ds


def run_arm(name, overrides, ds, out_root, steps, metrics_period,
            n_samples_for_metrics, img_size, batch_size, seed):
    from confignet_tpu.training.first_stage import ConfigNetFirstStage

    config = {
        "output_shape": (img_size, img_size, 3),
        "n_discr_layers": 5,
        "batch_size": batch_size,
        "compute_dtype": "bfloat16",
        "facemodel_inputs": ds.facemodel_inputs_config(),
        "metrics_checkpoint_period": metrics_period,
        # No image panels during arms (the full-chain run makes those);
        # step 0 still renders one, which is harmless.
        "image_checkpoint_period": 10**9,
        "seed": seed,
    }
    config.update(overrides)
    model = ConfigNetFirstStage(config)

    arm_dir = os.path.join(out_root, name)
    os.makedirs(arm_dir, exist_ok=True)
    t0 = time.time()
    model.train(ds, ds, arm_dir, os.path.join(arm_dir, "logs"), n_steps=steps,
                n_samples_for_metrics=n_samples_for_metrics)
    wall = time.time() - t0
    fid = [round(float(v), 4) for v in model.metrics.get("fid", [])]
    del model
    return arm_dir, wall, fid


def main(argv=None) -> None:
    from confignet_tpu.core.profiling import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True, help="output JSON path")
    p.add_argument("--work_dir", default="/tmp/ab_stage1_conditioning")
    p.add_argument("--steps", type=int, default=2500)
    p.add_argument("--metrics_period", type=int, default=250)
    p.add_argument("--n_samples_for_metrics", type=int, default=64)
    p.add_argument("--n_images", type=int, default=1024)
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=24)
    p.add_argument("--probe_batch", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--arms", nargs="*", default=None,
                   help="subset of arm names to run (default: all)")
    args = p.parse_args(argv)

    from confignet_tpu.core.randomness import initialize_random_seed

    from probe_conditioning import HAIR_VALUES, _checkpoints, probe_checkpoint

    datasets = {}  # n_images -> dataset (shared across arms)

    # Merge into an existing evidence file so arms can be run/recovered
    # across separate invocations (e.g. --arms subsets).
    if os.path.exists(args.out):
        with open(args.out) as fp:
            result = json.load(fp)
        result.setdefault("arms", {})
    else:
        result = {
            "steps": args.steps,
            "param": "head_hair_color",
            "img_size": args.img_size,
            "arms": {},
        }
    arm_names = args.arms or list(ARMS)
    for name in arm_names:
        overrides, data_mult = ARMS[name]
        n_images = args.n_images * data_mult
        if n_images not in datasets:
            initialize_random_seed(args.seed)
            datasets[n_images] = make_dataset(n_images, args.img_size, args.seed)
        print(f"=== arm {name}: overrides {overrides}, n_images {n_images}")
        initialize_random_seed(args.seed)
        arm_dir, wall, fid = run_arm(
            name, dict(overrides), datasets[n_images], args.work_dir,
            args.steps, args.metrics_period, args.n_samples_for_metrics,
            args.img_size, args.batch_size, args.seed)
        rows = []
        for ckpt in _checkpoints(os.path.join(arm_dir, "checkpoints")):
            row = probe_checkpoint(ckpt, "head_hair_color", HAIR_VALUES,
                                   args.probe_batch, args.seed)
            rows.append(row)
            print(json.dumps(row))
        result["arms"][name] = {
            "overrides": overrides,
            "n_images": n_images,
            "wall_seconds": round(wall, 1),
            "fid": fid,
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
