"""In-model follow-up to exp_2d_tail.py: how much of the standalone 2D-tail
cost survives XLA fusion inside the full generator forward?

Ablations at the bench shape (B=256, 256px, bf16):
  full        — the shipped model
  no-in       — instance-norm inside every AdaIN replaced by identity
                (affine + lrelu kept): isolates the IN reductions' cost
  no-adain    — AdaIN entirely gone (conv + lrelu only)

Run on the real chip:  python setup/exp_2d_tail_inmodel.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N_ITERS = 20
BATCH = 256
SIZE = 256


def bench(label: str) -> float:
    from confignet_tpu.models.generator import HologanGenerator

    latent_dim = 145
    gen = HologanGenerator(latent_dim=latent_dim, output_shape=(SIZE, SIZE),
                           dtype=jnp.bfloat16)
    variables = jax.jit(gen.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, latent_dim)), jnp.zeros((1, 3)))
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(BATCH, latent_dim)), jnp.float32)
    rot = rng.uniform(-1.0, 1.0, size=(BATCH, 3)).astype(np.float32)
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
    print(f"  {label:10s}: {ms:5.1f} ms/fwd  ({BATCH/(ms/1e3):.0f} img/s)", flush=True)
    return ms


def main():
    import confignet_tpu.models.blocks as blocks
    import confignet_tpu.ops.norms as norms

    print("devices:", jax.devices(), flush=True)
    full = bench("full")

    # adain_modulate resolves spatial_instance_norm through the norms
    # module globals at call time, so patching there reaches the model.
    orig_in = norms.spatial_instance_norm
    try:
        norms.spatial_instance_norm = lambda x, spatial_axes, eps=1e-3: x
        no_in = bench("no-in")
    finally:
        norms.spatial_instance_norm = orig_in

    orig_adain_call = blocks.AdaIN.__call__

    def identity_adain(self, x, z):
        return x

    try:
        blocks.AdaIN.__call__ = identity_adain
        no_adain = bench("no-adain")
    finally:
        blocks.AdaIN.__call__ = orig_adain_call

    print(f"IN reductions in-model cost: {full - no_in:5.1f} ms", flush=True)
    print(f"whole AdaIN in-model cost:   {full - no_adain:5.1f} ms", flush=True)


if __name__ == "__main__":
    main()
