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
import os
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


def _timed_train_steps(model, ds, step, model_args, n_iters):
    """Time n_iters donated train steps, returning (steps/s, staged).

    Measures the same overlapped path the train loop runs: batch sampling +
    host->device staging on a background thread (data/prefetch.py).  With
    BENCH_STAGED=1, batches are pre-staged on device and reused so the
    number is the pure device step time (what a co-located TPU host sees —
    the axon tunnel's ~60 MB/s host->device path otherwise floors it).
    """
    import jax

    from confignet_tpu.data.prefetch import BatchPrefetcher

    fetch = lambda l: float(jax.device_get(l["g"]["loss_sum"]))
    staged = os.environ.get("BENCH_STAGED") == "1"
    if staged:
        batches = [jax.device_put(model._sample_host_batch(ds, ds)) for _ in range(3)]
        jax.block_until_ready(batches)

        def make_args(i=[0]):
            i[0] += 1
            return (model.keychain.next(), batches[i[0] % len(batches)], *model_args)

        state, losses = step(model.state, *make_args())
        fetch(losses)
        _, elapsed = _time_chained_steps(step, state, make_args, n_iters, fetch)
    else:
        with BatchPrefetcher(lambda: model._sample_host_batch(ds, ds)) as pf:
            def make_args():
                return (model.keychain.next(), pf.next(), *model_args)

            # compile + warm
            state, losses = step(model.state, *make_args())
            fetch(losses)
            _, elapsed = _time_chained_steps(step, state, make_args, n_iters, fetch)
    return n_iters / elapsed, staged


def _metric_name_parts(cfg, staged):
    """Metric-name suffix + row annotations shared by both train-step benches.

    Non-default R1 head selection gets its own metric name so a --r1_heads
    run can't silently replace the reference-semantics row on the
    partial-run merge in main() — this applies to stage 2 as much as stage 1
    (r1_heads changes both steps' semantics)."""
    suffix = "" if cfg["batch_size"] == 24 else f"_b{cfg['batch_size']}"
    suffix += "_staged" if staged else ""
    row_kwargs = {}
    if cfg.get("r1_heads", "all") != "all":
        suffix += f"_r1_{cfg['r1_heads']}"
        row_kwargs["note"] = (
            f"r1_heads={cfg['r1_heads']} (single-head R1, Mescheder-style) "
            "instead of the reference's per-head penalty"
        )
    return suffix, row_kwargs


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

    steps_per_sec, staged = _timed_train_steps(model, ds, step, (vgg,), n_iters)
    suffix, row_kwargs = _metric_name_parts(cfg, staged)
    _emit(results, f"stage1_train_step_{dtype_name}{suffix}", steps_per_sec, "steps/s",
          batch=cfg["batch_size"],
          imgs_per_sec=round(steps_per_sec * cfg["batch_size"], 1),
          **row_kwargs)


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

    steps_per_sec, staged = _timed_train_steps(model, ds, step, (vgg, vggface), n_iters)
    suffix, row_kwargs = _metric_name_parts(cfg, staged)
    _emit(results, f"stage2_train_step_{dtype_name}{suffix}", steps_per_sec, "steps/s",
          batch=cfg["batch_size"],
          imgs_per_sec=round(steps_per_sec * cfg["batch_size"], 1),
          **row_kwargs)


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


def bench_serving(results, n_iters=20):
    """End-to-end serving path: encode a real photo batch -> splice one
    facemodel attribute into the latents -> generate, all on device.  This
    is the demo/eval hot path (encode_images + set_facemodel_param_in_latents
    + generate_images), measured as one jitted pipeline — the same program
    ``confignet_tpu.serving.ConfigNetServer.render_with_attribute`` serves
    (hand-rolled here so the bench controls device staging explicitly)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from confignet_tpu.training.second_stage import ConfigNet

    cfg = dict(BENCH_CONFIG, compute_dtype="bfloat16")
    model = ConfigNet(cfg)
    size = cfg["output_shape"][0]
    batch = 128

    rng = np.random.default_rng(0)
    # Staged on device once: production serving prefetches/pipelines the
    # uint8 input stream; over the axon tunnel a per-call 25 MB host->device
    # copy would measure tunnel bandwidth, not the TPU pipeline.
    imgs = jax.device_put(
        rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8))

    enc_params = model.state.generator.params["real_encoder"]
    gen_params = model.state.generator_smoothed
    synth_params = model.state.generator.params["synthetic_encoder"]
    param_name = "blendshape_values"
    value = jnp.zeros((1, dict(model.config["facemodel_inputs"])[param_name][0]))
    idxs = model.get_facemodel_param_idxs_in_latent(param_name)
    begin, end = idxs.start, idxs.stop
    synth_module = model.synthetic_encoder_module

    def pipeline(enc_p, gen_p, synth_p, u8_imgs, value):
        floats = u8_imgs.astype(jnp.float32) / 127.5 - 1.0
        latents, rotations = model.encoder_module.apply({"params": enc_p}, floats)
        slice_ = synth_module.apply(
            {"params": synth_p}, param_name, value,
            method=synth_module.encode_single_param)
        latents = latents.at[:, begin:end].set(slice_)
        return model.generator_module_fast.apply({"params": gen_p}, latents, rotations)

    fn = jax.jit(pipeline)
    out = fn(enc_params, gen_params, synth_params, imgs, value)
    np.asarray(jax.device_get(out[0, 0, 0]))  # compile + sync

    start = time.perf_counter()
    for _ in range(n_iters):
        out = fn(enc_params, gen_params, synth_params, imgs, value)
    np.asarray(jax.device_get(out[0, 0, 0]))
    elapsed = time.perf_counter() - start
    _emit(results, "serving_encode_splice_generate", batch * n_iters / elapsed,
          "img/s", batch=batch)


def bench_checkpointing(results, window=40, period=10):
    """Checkpoint cost through the REAL train loop.

    ONE model / ONE compiled step runs three consecutive windows of
    ``window`` steps — checkpoint-free, checkpoints via the async worker
    (default), checkpoints inline (reference semantics) — so the comparison
    carries no cross-compile or cross-model noise (the axon tunnel's ±30%
    drift between separate runs previously swamped the signal).  ``period``
    10 is ~50x denser than the production cadence (500), so besides the
    dense-cadence rates this emits the per-event stall and the PROJECTED
    overhead at the default 500-step cadence — the number the VERDICT r3
    acceptance (async within ~10% of steady) is about."""
    import tempfile

    from confignet_tpu.training.first_stage import ConfigNetFirstStage

    ds = _fake_dataset(BENCH_CONFIG["output_shape"][0])
    cfg = dict(BENCH_CONFIG, compute_dtype="bfloat16",
               image_checkpoint_period=10 ** 9,
               metrics_checkpoint_period=10 ** 9,
               async_checkpointing=True,
               loss_print_period=10 ** 9)
    model = ConfigNetFirstStage(cfg)
    rates, events = {}, {}
    with tempfile.TemporaryDirectory() as tmp:
        logs = os.path.join(tmp, "logs")
        # setup + compile + step 0, untimed
        model.train(ds, ds, tmp, logs, n_steps=1, n_samples_for_metrics=64)
        next_start = 1
        for label, p, async_flag in [
            ("steady", 10 ** 9, True),
            ("async", period, True),
            ("sync", period, False),
        ]:
            model.config["image_checkpoint_period"] = p
            model.config["metrics_checkpoint_period"] = p
            model.config["async_checkpointing"] = async_flag
            end = next_start + window
            events_before = model.checkpoint_events_run
            stats = model.train(ds, ds, tmp, logs, n_steps=end,
                                n_samples_for_metrics=64)
            next_start = end
            rates[label] = stats["steps_run"] / stats["loop_seconds"]
            # Count checkpoints that actually DISPATCHED (the r4 resume
            # off-by-one silently disabled them all while an analytic count
            # here reported 4 — never trust the schedule, trust the model).
            events[label] = model.checkpoint_events_run - events_before
            expected = sum(1 for s in range(end - stats["steps_run"], end)
                           if s % p == 0)
            if events[label] != expected:
                raise RuntimeError(
                    f"checkpoint window '{label}' dispatched {events[label]} "
                    f"checkpoint(s), schedule says {expected} — the bench "
                    "would be measuring nothing; refusing to emit rows")
            _emit(results, f"train_loop_ckpt_{label}", rates[label], "steps/s",
                  batch=cfg["batch_size"], n_steps=stats["steps_run"],
                  checkpoint_events=events[label])

    steady = rates["steady"]
    for label in ("async", "sync"):
        n_ev = max(events[label], 1)
        stall_s = max(0.0, (window / rates[label] - window / steady) / n_ev)
        overhead_500 = 100.0 * stall_s / (500.0 / steady + stall_s)
        _emit(results, f"ckpt_stall_per_event_{label}", stall_s, "s",
              note="extra wall per checkpoint event vs checkpoint-free window")
        _emit(results, f"ckpt_overhead_at_500_{label}", overhead_500, "%",
              note=("projected steps/s loss at the production 500-step "
                    "cadence; async acceptance <~10%"))


def bench_generator_512(results, n_iters=10):
    """512px generator forward throughput (the reference ships 256 and 512
    model sizes; bench.py's headline covers 256).

    Same methodology as bench.py's 256px headline: the iteration loop runs
    ON-DEVICE (lax.fori_loop inside one jit, input varied per iteration) so
    the number measures hardware throughput, not host-dispatch round trips
    over the ~30 ms axon tunnel — the earlier host-loop variant of this
    bench under-reported 512px throughput ~4.7x for exactly that reason."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from confignet_tpu.models.generator import HologanGenerator

    latent_dim = 145
    batch = 64
    gen = HologanGenerator(latent_dim=latent_dim, output_shape=(512, 512),
                           dtype=jnp.bfloat16)
    variables = jax.jit(gen.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, latent_dim)), jnp.zeros((1, 3)))
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(batch, latent_dim)).astype(np.float32))
    # Reference head-pose sampling ranges (yaw +-30deg, pitch +-10deg,
    # roll 0) — the rotation kernel's slab-skip bounds are data-dependent.
    rot = rng.uniform(-1.0, 1.0, size=(batch, 3)).astype(np.float32)
    rot *= np.array([np.pi / 6, np.pi / 18, 0.0], np.float32)
    rot = jnp.asarray(rot)

    def many(p, z, r):
        def body(i, acc):
            out = gen.apply({"params": p}, z + i * 1e-6, r)
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    fn = jax.jit(many)
    float(fn(variables["params"], z, rot))  # compile + one full run

    start = time.perf_counter()
    float(fn(variables["params"], z, rot))  # scalar fetch forces completion
    elapsed = time.perf_counter() - start
    _emit(results, "generator_fwd_512_throughput", batch * n_iters / elapsed,
          "img/s", batch=batch, n_iters=n_iters,
          note="on-device fori_loop, same methodology as bench.py's 256px headline")


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--only", default=None,
                        help="comma list: stage1_f32,stage1_bf16,stage2_f32,"
                             "stage2_bf16,fine_tune,serving,gen512,checkpointing")
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--batch_size", type=int, default=None,
                        help="override the train-step batch (default 24, the "
                             "reference value); throughput probes use 96/192")
    parser.add_argument("--r1_heads", default=None, choices=["all", "final"],
                        help="override R1 penalty head selection")
    parser.add_argument("--set", action="append", default=[],
                        help="config override key=value (value parsed as "
                             "JSON, falling back to string); repeatable")
    args = parser.parse_args()
    only = set(args.only.split(",")) if args.only else None
    if args.batch_size is not None:
        BENCH_CONFIG["batch_size"] = args.batch_size
    if args.r1_heads is not None:
        BENCH_CONFIG["r1_heads"] = args.r1_heads
    for override in args.set:
        key, _, raw = override.partition("=")
        try:
            BENCH_CONFIG[key] = json.loads(raw)
        except json.JSONDecodeError:
            BENCH_CONFIG[key] = raw

    results = []

    def want(name):
        return only is None or name in only

    for name, fn in [
        ("stage1_f32", lambda: bench_stage1(results, "float32", args.iters)),
        ("stage1_bf16", lambda: bench_stage1(results, "bfloat16", args.iters)),
        ("stage2_f32", lambda: bench_stage2(results, "float32", args.iters)),
        ("stage2_bf16", lambda: bench_stage2(results, "bfloat16", args.iters)),
        ("fine_tune", lambda: bench_fine_tune(results)),
        ("serving", lambda: bench_serving(results)),
        ("gen512", lambda: bench_generator_512(results)),
        ("checkpointing", lambda: bench_checkpointing(results)),
    ]:
        if not want(name):
            continue
        try:
            fn()
        except Exception as exc:  # axon tunnel can 413/500 on huge programs
            row = {"metric": name, "error": f"{type(exc).__name__}: {exc}"[:300]}
            results.append(row)
            print(json.dumps(row))

    # A partial (--only) run updates its metrics in place, preserving the
    # rest of an existing BENCH_TRAIN.json.
    merged = []
    if only is not None and os.path.exists("BENCH_TRAIN.json"):
        with open("BENCH_TRAIN.json") as fp:
            new_names = {r.get("metric") for r in results}
            merged = [r for r in json.load(fp) if r.get("metric") not in new_names]
    with open("BENCH_TRAIN.json", "w") as fp:
        json.dump(merged + results, fp, indent=2)


if __name__ == "__main__":
    main()
