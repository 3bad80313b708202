"""Measure how strongly saved checkpoints condition on a facemodel param.

For every checkpoint in one or more checkpoint directories (stage-1 and/or
stage-2 outputs of run_quality_evidence.py), splice contrasting values of a
facemodel parameter (default: head_hair_color blond vs black vs red) into a
fixed latent batch via the synthetic encoder — the exact mechanism of the
Table-2 controllability protocol (reference:
confignet/confignet_first_stage.py:228-242, set_facemodel_param_in_latents)
— and record:

  * ``latent_spread``  — mean pairwise L2 distance between the spliced
    latent slices (does the synthetic encoder still distinguish the
    values?), and
  * ``pixel_delta``    — mean |G(splice a) - G(splice b)| over the batch in
    uint8 levels (does the distinction reach pixels?).

This localizes *where* in the chain attribute conditioning develops or
erodes, without retraining anything.  Output: one JSON with a row per
checkpoint.

Usage:
  python setup/probe_conditioning.py \
      --ckpt_dirs /tmp/quality_r4b/checkpoints /tmp/quality_r4b/stage2/checkpoints \
      --out docs/evidence_conditioning_trajectory.json
"""
from __future__ import annotations

import argparse
import glob
import itertools
import json
import os

import numpy as np

# Probe anchors = the controllability protocol's own set-values
# (controllability_metric_configs.py / data/procedural.HAIR_COLOR_ANCHORS),
# so probe contrasts are measured between the exact colors the protocol
# drives and the procedural judge classifies.  NOTE: the round-4 committed
# artifact (docs/evidence_conditioning_trajectory.json) was generated with
# an earlier ad-hoc triple — distinct colors, so the conditioning-strength
# trend it records is valid, but its nicknames did not match the protocol;
# its keys were corrected to descriptive names.
HAIR_VALUES = {
    "Black_Hair": (0.0, 1.0, 0.0),
    "Blond_Hair": (0.0, 0.1, 0.1),
    "Gray_Hair": (0.7, 0.7, 0.0),
}


def _checkpoints(ckpt_dir: str):
    for path in sorted(glob.glob(os.path.join(ckpt_dir, "*.json"))):
        if path.endswith("_log.json"):
            continue
        yield path


def probe_checkpoint(path: str, param_name: str, values, batch: int, seed: int):
    """Probe one checkpoint.  Frees JAX's compiled-executable caches on the
    way out: every load_confignet builds a fresh model whose jitted
    closures would otherwise accumulate for the life of the process —
    probing the 40+ checkpoints of a 4-arm A/B run grew past 128 GB RSS
    and got the round-5 run OOM-killed before this."""
    try:
        return _probe_checkpoint_body(path, param_name, values, batch, seed)
    finally:
        import jax

        jax.clear_caches()


def _probe_checkpoint_body(path: str, param_name: str, values, batch: int, seed: int):
    from confignet_tpu.core.model_io import load_confignet

    model = load_confignet(path)
    idxs = model.get_facemodel_param_idxs_in_latent(param_name)
    rng = np.random.RandomState(seed)
    # A fixed latent batch from the checkpoint's own facemodel distributions
    # (same sampling path the trainer's visualization uses).
    latent = np.asarray(model.sample_latent_vector(batch))
    rng_rot = rng.uniform(-0.2, 0.2, (batch, 3)).astype(np.float32)

    slices, images = {}, {}
    for name, val in values.items():
        spliced = model.set_facemodel_param_in_latents(
            latent, param_name, np.asarray(val, np.float32)
        )
        slices[name] = np.asarray(spliced)[:, idxs]
        images[name] = np.asarray(
            model.generate_images(spliced, rng_rot), np.float32
        )

    pairs = list(itertools.combinations(sorted(values), 2))
    latent_spread = float(
        np.mean([np.linalg.norm(slices[a] - slices[b], axis=1).mean() for a, b in pairs])
    )
    pixel_delta = float(
        np.mean([np.abs(images[a] - images[b]).mean() for a, b in pairs])
    )
    return {
        "checkpoint": path,
        "step": int(os.path.basename(path).split(".")[0]),
        "latent_spread": round(latent_spread, 5),
        "pixel_delta": round(pixel_delta, 4),
    }


def main(argv=None) -> None:
    from confignet_tpu.core.profiling import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dirs", nargs="+", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--param", default="head_hair_color")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from confignet_tpu.core.randomness import initialize_random_seed

    initialize_random_seed(args.seed)

    result = {"param": args.param, "values": HAIR_VALUES, "trajectories": {}}
    for ckpt_dir in args.ckpt_dirs:
        rows = []
        for path in _checkpoints(ckpt_dir):
            row = probe_checkpoint(path, args.param, HAIR_VALUES, args.batch, args.seed)
            rows.append(row)
            print(json.dumps(row))
        result["trajectories"][ckpt_dir] = rows

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
