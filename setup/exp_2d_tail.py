"""Per-stage cost breakdown of the generator's post-rotation tail at the
bench shape (B=256, 256px, bf16) — VERDICT r3 item 8 / ROADMAP item 1.

The round-3 in-model decomposition left a 35.5 ms rotation-free forward;
the 3D convs measured at 86% of bf16 peak, so the question is where the
rest goes: the 2D AdaIN chain, the projection, instance-norm bandwidth, or
low-channel MXU underutilization in the late blocks.

Measures, standalone per stage (same shapes as the 256px model, nf=256):
  1. each conv (the subpixel-collapsed form actually executed in-model),
     with achieved TFLOP/s vs the ~197 TFLOP/s v5e bf16 peak;
  2. the AdaIN epilogue (instance-norm + scale/shift + leaky-relu) per
     shape — bandwidth-bound, reported against ~819 GB/s HBM;
  3. a space-to-depth rewrite A/B for the narrow-channel late convs.

Run on the real chip:  python setup/exp_2d_tail.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

BF16_PEAK_TFLOPS = 197.0
HBM_GBPS = 819.0
N_ITERS = 30
BATCH = 256


def _timed(fn, *args) -> float:
    """Best-of-3 chained timing, input varied per iteration (ROADMAP caveat
    5: an unvaried probe over the tunnel measures RTT/n, not the op)."""

    def many(*a):
        def body(i, acc):
            out = fn(a[0] + i * jnp.asarray(1e-6, a[0].dtype), *a[1:])
            return acc + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, N_ITERS, body, 0.0)

    jfn = jax.jit(many)
    float(jfn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N_ITERS * 1000.0


def conv2d(x, k, b):
    out = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b


def stage_conv(name, s, cin, cout, ksize, rng):
    x = jnp.asarray(rng.normal(size=(BATCH, s, s, cin)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(ksize, ksize, cin, cout)) * 0.05, jnp.bfloat16)
    b = jnp.zeros((cout,), jnp.bfloat16)
    ms = _timed(conv2d, x, k, b)
    gflop = 2.0 * BATCH * s * s * cin * cout * ksize * ksize / 1e9
    tflops = gflop / ms
    print(f"  {name:28s} {s:4d}^2 {cin:4d}->{cout:4d} k{ksize}: "
          f"{ms:6.2f} ms  {tflops:6.1f} TF/s ({100*tflops/BF16_PEAK_TFLOPS:4.1f}% peak)",
          flush=True)
    return ms


def adain_epilogue(x, gamma, beta):
    mean = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
    var = jnp.var(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
    y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y * gamma[:, None, None, :] + beta[:, None, None, :]
    return jnp.where(y >= 0, y, 0.3 * y).astype(x.dtype)


def stage_adain(name, s, c, rng):
    x = jnp.asarray(rng.normal(size=(BATCH, s, s, c)), jnp.bfloat16)
    gamma = jnp.asarray(rng.normal(size=(BATCH, c)), jnp.float32)
    beta = jnp.asarray(rng.normal(size=(BATCH, c)), jnp.float32)
    ms = _timed(adain_epilogue, x, gamma, beta)
    gb = 2.0 * BATCH * s * s * c * 2 / 1e9  # read + write, bf16
    print(f"  {name:28s} {s:4d}^2 c={c:4d}     : {ms:6.2f} ms  "
          f"{gb/ms*1000:6.0f} GB/s ({100*gb/ms*1000/HBM_GBPS:4.1f}% HBM)",
          flush=True)
    return ms


def space_to_depth_conv(x, k9, b):
    """Exact rewrite of a 4x4 SAME conv as s2d(2) -> 3x3 conv -> d2s(2).
    (Not numerically wired here — same FLOP/layout structure, for timing.)"""
    bsz, s, _, c = x.shape
    xs = x.reshape(bsz, s // 2, 2, s // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(bsz, s // 2, s // 2, 4 * c)
    out = jax.lax.conv_general_dilated(
        xs, k9, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    co4 = out.shape[-1]
    out = out.reshape(bsz, s // 2, s // 2, 2, 2, co4 // 4)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(bsz, s, s, co4 // 4)
    return out


def stage_s2d(name, s, cin, cout, rng):
    x = jnp.asarray(rng.normal(size=(BATCH, s, s, cin)), jnp.bfloat16)
    k9 = jnp.asarray(rng.normal(size=(3, 3, 4 * cin, 4 * cout)) * 0.05, jnp.bfloat16)
    b = jnp.zeros((4 * cout,), jnp.bfloat16)
    ms = _timed(space_to_depth_conv, x, k9, b)
    gflop = 2.0 * BATCH * (s // 2) ** 2 * 4 * cin * 4 * cout * 9 / 1e9
    print(f"  {name:28s} {s:4d}^2 {cin:4d}->{cout:4d} s2d: {ms:6.2f} ms  "
          f"({gflop/ms:6.1f} TF/s of its OWN 2.25x flops)", flush=True)
    return ms


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # The 256px chain (nf=256) as actually lowered: subpixel upconvs run on
    # the SMALL grid with 4x out-channels (ops/upconv.py), map_2d_0 is a
    # plain 4x4, projection is 1x1 on the reshaped volume.
    print("convs (as executed in-model):", flush=True)
    total = 0.0
    total += stage_conv("projection_conv(1x1)", 16, 1024, 512, 1, rng)
    total += stage_conv("map_2d_0", 16, 512, 256, 4, rng)
    total += stage_conv("map_2d_1(subpixel)", 16, 256, 256, 4, rng)   # 4*64 out
    total += stage_conv("map_2d_2(subpixel)", 32, 64, 128, 4, rng)    # 4*32 out
    total += stage_conv("map_2d_2b(subpixel)", 64, 32, 128, 4, rng)   # 4*32 out
    total += stage_conv("map_final(subpixel)", 128, 32, 12, 4, rng)   # 4*3 out
    print(f"  {'2D conv total':28s}: {total:6.2f} ms", flush=True)

    print("AdaIN epilogues (instance-norm + affine + lrelu):", flush=True)
    a = 0.0
    a += stage_adain("map_2d_0.adain", 16, 256, rng)
    a += stage_adain("map_2d_1.adain", 32, 64, rng)
    a += stage_adain("map_2d_2.adain", 64, 32, rng)
    a += stage_adain("map_2d_2b.adain", 128, 32, rng)
    print(f"  {'AdaIN total':28s}: {a:6.2f} ms", flush=True)

    print("space-to-depth A/B for the narrow-channel late convs:", flush=True)
    stage_s2d("map_2d_2b as s2d", 64, 32, 32, rng)
    stage_s2d("map_final as s2d", 128, 32, 3, rng)

    # 3D reference point for context (the known 86%-peak stage).
    print("context: 16^3 3D conv (map_3d_post shape):", flush=True)
    x = jnp.asarray(rng.normal(size=(BATCH, 16, 16, 16, 128)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 128, 64)) * 0.05, jnp.bfloat16)

    def c3(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    ms = _timed(c3, x, k)
    gflop = 2.0 * BATCH * 16 ** 3 * 128 * 64 * 27 / 1e9
    print(f"  3dconv 16^3 128->64: {ms:6.2f} ms  {gflop/ms:6.1f} TF/s "
          f"({100*(gflop/ms)/BF16_PEAK_TFLOPS:4.1f}% peak)", flush=True)


if __name__ == "__main__":
    main()
