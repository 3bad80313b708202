"""Benchmark: 256x256 generator forward throughput (the north-star metric,
BASELINE.md: >= 2000 img/s on a v5e-8 slice).

The iteration loop runs on-device (lax.fori_loop inside one jit) so the
number measures hardware throughput, not host/tunnel round-trip latency —
matching how a production serving pipeline batches generation.  Runs on
whatever devices are attached; ``vs_baseline`` normalizes pro-rata to the
8-chip target (2000 * n_devices / 8), so >= 1.0 means on-track for the
v5e-8 goal.  Prints exactly one JSON line.
"""
from __future__ import annotations

import json
import os
import threading
import time


def _watchdog(timeout_s: float, stage: dict) -> None:
    """The axon tunnel can wedge so hard that ``jax.devices()`` blocks
    forever (observed 2026-08-18).  Rather than hang the driver, emit one
    honest JSON line flagging the environment failure and exit."""
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if stage.get("devices_ok"):
            return
        time.sleep(5)
    print(
        json.dumps(
            {
                "metric": "generator_fwd_256_throughput",
                "value": 0.0,
                "unit": "img/s",
                "vs_baseline": 0.0,
                "error": "TPU backend unreachable: jax.devices() did not "
                         f"return within {int(timeout_s)}s (tunnel outage, "
                         "not a framework failure)",
            }
        ),
        flush=True,
    )
    os._exit(3)


def main() -> None:
    stage: dict = {}
    timeout_s = float(os.environ.get("CONFIGNET_TPU_BENCH_DEVICE_TIMEOUT", "600"))
    threading.Thread(
        target=_watchdog, args=(timeout_s, stage), daemon=True
    ).start()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from confignet_tpu.models.generator import HologanGenerator
    from confignet_tpu.parallel import create_mesh, replicate, shard_batch

    devices = jax.devices()
    stage["devices_ok"] = True
    n_dev = len(devices)
    mesh = create_mesh(devices)

    latent_dim = 145
    batch = 256 * n_dev
    n_iters = 20
    generator = HologanGenerator(
        latent_dim=latent_dim, output_shape=(256, 256), dtype=jnp.bfloat16
    )

    variables = jax.jit(generator.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, latent_dim)), jnp.zeros((1, 3))
    )
    params = replicate(mesh, variables["params"])

    rng = np.random.default_rng(0)
    z = shard_batch(mesh, rng.normal(size=(batch, latent_dim)).astype(np.float32))
    # Head-pose distribution = the reference's sampling ranges (yaw +-30deg,
    # pitch +-10deg, roll 0 — confignet_first_stage.py:404-435 /
    # rotation_ranges).  The rotation kernel's slab-skip bounds are
    # data-dependent, so the benchmark must use the real pose distribution.
    rot = rng.uniform(-1.0, 1.0, size=(batch, 3)).astype(np.float32)
    rot *= np.array([np.pi / 6, np.pi / 18, 0.0], np.float32)
    rot = shard_batch(mesh, rot)

    def many(p, z, r):
        def body(i, acc):
            out = generator.apply({"params": p}, z + i * 1e-6, r)
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    fn = jax.jit(many)
    float(fn(params, z, rot))  # compile + one full run

    start = time.perf_counter()
    float(fn(params, z, rot))  # host fetch of the scalar forces completion
    elapsed = time.perf_counter() - start

    imgs_per_sec = n_iters * batch / elapsed
    baseline = 2000.0 * n_dev / 8.0
    print(
        json.dumps(
            {
                "metric": "generator_fwd_256_throughput",
                "value": round(imgs_per_sec, 1),
                "unit": "img/s",
                "vs_baseline": round(imgs_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
