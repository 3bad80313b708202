"""Training-path benchmarks: fused stage-1 / stage-2 step throughput and
one-shot fine-tune iteration rate (BASELINE.md: "fine-tune ... steps/sec
tracked").

Prints one JSON line per metric and writes the collection to
BENCH_TRAIN.json.  ``bench.py`` remains the driver's single-line headline
(generator forward throughput); this file covers the training loop — the
actual expensive path, with R1 grad-of-grad and VGG perceptual forwards.

Timing notes (this rig): ``block_until_ready`` does not block over the axon
TPU tunnel, so each measurement chains N donated steps and fetches a loss
scalar from the LAST step — the data dependency forces completion of the
whole chain.  The first call is excluded (compile).
"""
from __future__ import annotations

import json
import time

BENCH_CONFIG = {
    # Reference-scale model: 256px output, 5 discriminator layers, the
    # standard 145-dim latent layout.  Facemodel input dims are plausible
    # stand-ins (they only size the tiny per-param MLPs).
    "output_shape": (256, 256, 3),
    "n_discr_layers": 5,
    "batch_size": 24,  # reference default (confignet_first_stage.py:53)
    "facemodel_inputs": {
        "texture_embedding": (60, 30),
        "geometry_identity_params": (60, 30),
        "blendshape_values": (51, 30),
        "beard_style_embedding": (7, 7),
        "eyebrow_style_embedding": (7, 7),
        "lower_eyelash_style": (2, 2),
        "upper_eyelash_style": (2, 2),
        "head_hair_style_embedding": (9, 9),
        "eye_color": (3, 3),
        "head_hair_color": (3, 3),
        "hdri_embedding": (20, 20),
        "bone_rotations:left_eye": (2, 2),
    },
    "metrics_checkpoint_period": 10 ** 9,
    "image_checkpoint_period": 10 ** 9,
}


def _emit(results, metric, value, unit, **extra):
    row = {"metric": metric, "value": round(value, 3), "unit": unit, **extra}
    results.append(row)
    print(json.dumps(row))


def _fake_dataset(img_size, n_images=64):
    import sys

    sys.path.insert(0, "tests")
    from helpers import FakeDataset

    dims = {k: v[0] for k, v in BENCH_CONFIG["facemodel_inputs"].items()}
    dims.pop("bone_rotations:left_eye", None)
    ds = FakeDataset(n_images=n_images, img_size=img_size, facemodel_dims=dims)
    ds.metadata_inputs["bone_rotations:left_eye"] = (
        ds.metadata_inputs["rotations"][:, :2].copy()
    )
    from helpers import FakeDistribution

    ds.metadata_input_distributions["bone_rotations:left_eye"] = FakeDistribution(
        ds.metadata_inputs["bone_rotations:left_eye"]
    )
    return ds


def _time_chained_steps(step, state, make_args, n_iters, fetch_loss):
    """Run n_iters donated steps (each consuming the previous state) and
    time them via a final loss fetch."""
    start = time.perf_counter()
    losses = None
    for _ in range(n_iters):
        state, losses = step(state, *make_args())
    fetch_loss(losses)  # forces the whole chain
    return state, time.perf_counter() - start


def bench_stage1(results, dtype_name, n_iters=10):
    import jax

    from confignet_tpu.training.first_stage import ConfigNetFirstStage

    cfg = dict(BENCH_CONFIG, compute_dtype=dtype_name)
    model = ConfigNetFirstStage(cfg)
    ds = _fake_dataset(cfg["output_shape"][0])
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        model.setup_training(tmp, ds, n_samples_for_metrics=4)
    step = model._build_train_step()
    vgg = model.perceptual_loss.variables["params"]

    def make_args():
        return (model.keychain.next(), model._sample_host_batch(ds, ds), vgg)

    # compile + warm
    state, losses = step(model.state, *make_args())
    float(jax.device_get(losses["g"]["loss_sum"]))

    state, elapsed = _time_chained_steps(
        step, state, make_args, n_iters,
        lambda l: float(jax.device_get(l["g"]["loss_sum"])),
    )
    steps_per_sec = n_iters / elapsed
    _emit(results, f"stage1_train_step_{dtype_name}", steps_per_sec, "steps/s",
          batch=cfg["batch_size"],
          imgs_per_sec=round(steps_per_sec * cfg["batch_size"], 1))


def bench_stage2(results, dtype_name, n_iters=10):
    import jax

    from confignet_tpu.training.second_stage import ConfigNet

    cfg = dict(BENCH_CONFIG, compute_dtype=dtype_name)
    model = ConfigNet(cfg)
    ds = _fake_dataset(cfg["output_shape"][0])
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        model.setup_training(tmp, ds, n_samples_for_metrics=4,
                             real_training_set=ds, validation_set=ds)
    step = model._build_train_step()
    vgg = model.perceptual_loss.variables["params"]
    vggface = model.perceptual_loss_face_reco.variables["params"]

    def make_args():
        return (model.keychain.next(), model._sample_host_batch(ds, ds), vgg, vggface)

    state, losses = step(model.state, *make_args())
    float(jax.device_get(losses["g"]["loss_sum"]))

    state, elapsed = _time_chained_steps(
        step, state, make_args, n_iters,
        lambda l: float(jax.device_get(l["g"]["loss_sum"])),
    )
    steps_per_sec = n_iters / elapsed
    _emit(results, f"stage2_train_step_{dtype_name}", steps_per_sec, "steps/s",
          batch=cfg["batch_size"],
          imgs_per_sec=round(steps_per_sec * cfg["batch_size"], 1))


def bench_fine_tune(results, n_iters=50):
    import numpy as np

    from confignet_tpu.training.second_stage import ConfigNet

    cfg = dict(BENCH_CONFIG)
    model = ConfigNet(cfg)
    size = cfg["output_shape"][0]
    img = np.random.default_rng(0).integers(0, 256, (size, size, 3), dtype=np.uint8)

    model.fine_tune_on_img(img, n_iters=1)  # compile
    start = time.perf_counter()
    model.fine_tune_on_img(img, n_iters=n_iters)  # final loss fetch syncs
    elapsed = time.perf_counter() - start
    _emit(results, "one_shot_fine_tune", n_iters / elapsed, "iters/s",
          total_s_for_50=round(elapsed, 2))


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--only", default=None,
                        help="comma list: stage1_f32,stage1_bf16,stage2_f32,"
                             "stage2_bf16,fine_tune")
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()
    only = set(args.only.split(",")) if args.only else None

    results = []

    def want(name):
        return only is None or name in only

    for name, fn in [
        ("stage1_f32", lambda: bench_stage1(results, "float32", args.iters)),
        ("stage1_bf16", lambda: bench_stage1(results, "bfloat16", args.iters)),
        ("stage2_f32", lambda: bench_stage2(results, "float32", args.iters)),
        ("stage2_bf16", lambda: bench_stage2(results, "bfloat16", args.iters)),
        ("fine_tune", lambda: bench_fine_tune(results)),
    ]:
        if not want(name):
            continue
        try:
            fn()
        except Exception as exc:  # axon tunnel can 413/500 on huge programs
            row = {"metric": name, "error": f"{type(exc).__name__}: {exc}"[:300]}
            results.append(row)
            print(json.dumps(row))

    with open("BENCH_TRAIN.json", "w") as fp:
        json.dump(results, fp, indent=2)


if __name__ == "__main__":
    main()
