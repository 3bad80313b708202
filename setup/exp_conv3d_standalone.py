"""Microbench: is XLA's conv3d lowering on TPU leaving MXU throughput on
the table vs a z-decomposed conv2d formulation?

Shapes = the generator's two big 3D convs (B=256, bf16):
  A: 16^3 x 256 -> 128, k=3^3   (map_3d_1, the FLOP peak)
  B: 8^3  x 512 -> 256, k=3^3   (map_3d_0)
  C: 16^3 x 128 -> 64,  k=3^3   (map_3d_post_0)

Timing discipline: vary the input every iteration inside the fori_loop
(docs/SCALING.md caveat — XLA hoists loop-invariant computation).
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

N_ITERS = 20


def timeit(fn, *args):
    f = jax.jit(fn)
    float(f(*args))  # compile + 1 run
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N_ITERS * 1000.0  # ms per iteration


def loop(body_fn, x, k):
    def body(i, acc):
        out = body_fn(x + i * jnp.bfloat16(1e-3), k)
        return acc + jnp.sum(out.astype(jnp.float32))
    return jax.lax.fori_loop(0, N_ITERS, body, 0.0)


def conv3d_xla(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv3d_zdecomp(x, k):
    B, D, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for dz in range(3):
        xs = xp[:, dz:dz + D].reshape(B * D, H, W, C)
        o = jax.lax.conv_general_dilated(
            xs, k[dz], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = o if out is None else out + o
    return out.reshape(B, D, H, W, -1)


def conv3d_zconcat(x, k):
    B, D, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    xcat = jnp.concatenate([xp[:, dz:dz + D] for dz in range(3)], axis=-1)
    kcat = jnp.concatenate([k[0], k[1], k[2]], axis=2)  # (3,3,3C,Co)
    o = jax.lax.conv_general_dilated(
        xcat.reshape(B * D, H, W, 3 * C), kcat, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return o.reshape(B, D, H, W, -1)


def run(name, B, D, Cin, Cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, D, D, D, Cin)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, Cin, Cout)) * 0.05, jnp.bfloat16)
    # correctness first
    ref = conv3d_xla(x, k)
    for label, fn in [("zdecomp", conv3d_zdecomp), ("zconcat", conv3d_zconcat)]:
        got = fn(x, k)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        print(f"{name} {label}: max abs err {err:.4f} (scale {scale:.1f})", flush=True)
    flops = B * D**3 * 27 * Cin * Cout * 2 / 1e12
    for label, fn in [("xla3d", conv3d_xla), ("zdecomp", conv3d_zdecomp),
                      ("zconcat", conv3d_zconcat)]:
        ms = timeit(lambda x, k, fn=fn: loop(fn, x, k), x, k)
        print(f"{name} {label}: {ms:.2f} ms  ({flops / (ms / 1e3):.0f} TFLOP/s)",
              flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    run("A(16^3,256->128)", 256, 16, 256, 128)
    run("B(8^3,512->256)", 256, 8, 512, 256)
    run("C(16^3,128->64)", 256, 16, 128, 64)
