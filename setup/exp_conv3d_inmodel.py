"""In-model A/B: generator forward throughput with conv3d impl xla vs
zdecomp (B=256, 256px, bf16, real pose distribution) — bench.py harness."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from confignet_tpu.models.generator import HologanGenerator

N_ITERS = 20


def bench(impl: str) -> float:
    latent_dim = 145
    batch = 256
    gen = HologanGenerator(
        latent_dim=latent_dim, output_shape=(256, 256), dtype=jnp.bfloat16,
        conv3d_impl=impl,
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
    print(f"{impl}: {ms:.1f} ms/fwd  ({batch / (ms/1e3):.0f} img/s)", flush=True)
    return ms


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    a = bench("xla")
    b = bench("zdecomp")
    print(f"zdecomp speedup: {a / b:.3f}x", flush=True)
