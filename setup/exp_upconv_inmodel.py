"""In-model A/B: generator forward throughput with the upsample+conv
lowering naive vs subpixel (ops/upconv.py), at the bench.py shape
(B=256, 256px, bf16, real pose distribution) and at 512px (B=64).

Run on the real chip: python setup/exp_upconv_inmodel.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from confignet_tpu.models.generator import HologanGenerator

N_ITERS = 20


def bench(impl: str, size: int, batch: int) -> float:
    latent_dim = 145
    gen = HologanGenerator(
        latent_dim=latent_dim, output_shape=(size, size), dtype=jnp.bfloat16,
        upconv_impl=impl,
    )
    variables = jax.jit(gen.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, latent_dim)), jnp.zeros((1, 3))
    )
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(batch, latent_dim)), jnp.float32)
    rot = rng.uniform(-1.0, 1.0, size=(batch, 3)).astype(np.float32)
    rot *= np.array([np.pi / 6, np.pi / 18, 0.0], np.float32)
    rot = jnp.asarray(rot)

    def many(p, z, r):
        def body(i, acc):
            out = gen.apply({"params": p}, z + i * 1e-6, r)
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, N_ITERS, body, 0.0)

    fn = jax.jit(many)
    float(fn(variables["params"], z, rot))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(variables["params"], z, rot))
        best = min(best, time.perf_counter() - t0)
    ms = best / N_ITERS * 1000
    print(
        f"{size}px {impl:8s}: {ms:5.1f} ms/fwd  ({batch / (ms/1e3):.0f} img/s)",
        flush=True,
    )
    return ms


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for size, batch in ((256, 256), (512, 64)):
        a = bench("naive", size, batch)
        b = bench("subpixel", size, batch)
        print(f"{size}px subpixel speedup: {a / b:.3f}x", flush=True)
