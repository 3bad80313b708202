"""Fused AdaIN (instance-norm + latent modulation) Pallas TPU kernel.

XLA lowers ``spatial_instance_norm`` + modulate as two HBM passes over the
feature map (one to reduce mean/var, one to normalize-and-affine), plus an
f32 round trip in bf16 mode.  Each (sample, HW, C) slab of every AdaIN call
site in the generator fits VMEM whole (largest: 128^2 x 32 bf16 = 1 MB, 3D:
16^3 x 128 = 1 MB), so this kernel runs grid=(B,) with the entire slab
resident: ONE HBM read, stats + normalize + ``xhat * (scale+1) + bias`` in
VMEM (f32 math), ONE write.  Semantics match ``ops/norms.adain_modulate``
(reference: confignet/dnn_models/building_blocks.py:132-149, eps INSIDE the
rsqrt) to f32 accumulation tolerance.

The backward pass is plain-XLA math via ``jax.custom_vjp`` (standard
instance-norm backward, gradient checked against autodiff of the XLA
composition in tests/test_pallas_interpret.py) — the fwd fusion still
applies inside train steps.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _adain_kernel(x_ref, scale_ref, bias_ref, out_ref, *, eps: float):
    x = x_ref[0].astype(jnp.float32)                       # (HW, C)
    mean = jnp.mean(x, axis=0, keepdims=True)              # (1, C)
    var = jnp.mean(jnp.square(x - mean), axis=0, keepdims=True)
    xhat = (x - mean) * jax.lax.rsqrt(var + eps)
    scale = scale_ref[0].astype(jnp.float32)               # (1, C)
    bias = bias_ref[0].astype(jnp.float32)
    out_ref[0] = (xhat * (scale + 1.0) + bias).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _fused_adain_3dview(x3, scale, bias, eps: float, interpret: bool = False):
    batch, hw, channels = x3.shape
    # (B, 1, C) views so every block's last two dims equal the array's
    # (Mosaic tiling requirement for non-multiple-of-(8,128) blocks).
    scale3 = scale.reshape(batch, 1, channels)
    bias3 = bias.reshape(batch, 1, channels)
    return pl.pallas_call(
        functools.partial(_adain_kernel, eps=eps),
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, hw, channels), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, channels), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, channels), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, channels), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, hw, channels), x3.dtype),
        interpret=interpret,
    )(x3, scale3, bias3)


def _spatial_stats(x3):
    mean = jnp.mean(x3.astype(jnp.float32), axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x3.astype(jnp.float32) - mean), axis=1, keepdims=True)
    return mean, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_adain(x, scale, bias, eps: float = 1e-3, interpret: bool = False):
    """``adain_modulate`` with the spatial axes fused in VMEM.

    x: (B, *spatial, C); scale/bias: (B, C).  Stats are taken over ALL
    non-batch, non-channel axes (2D and 3D feature maps alike).
    """
    shape = x.shape
    x3 = x.reshape(shape[0], -1, shape[-1])
    out = _fused_adain_3dview(x3, scale, bias, eps, interpret)
    return out.reshape(shape)


def _fused_adain_fwd(x, scale, bias, eps, interpret):
    out = fused_adain(x, scale, bias, eps, interpret)
    # bias is saved only so dbias can be cast to ITS dtype (scale and bias
    # may legitimately differ, e.g. bf16 scale with an f32 bias); it is
    # (B, C) — negligible next to x.
    return out, (x, scale, bias)


def _fused_adain_bwd(eps, interpret, residuals, g):
    x, scale, bias = residuals
    shape = x.shape
    x3 = x.reshape(shape[0], -1, shape[-1])
    g3 = g.reshape(shape[0], -1, shape[-1]).astype(jnp.float32)
    mean, var = _spatial_stats(x3)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x3.astype(jnp.float32) - mean) * rstd

    dbias = jnp.sum(g3, axis=1)                            # (B, C)
    dscale = jnp.sum(g3 * xhat, axis=1)                    # (B, C)
    dxhat = g3 * (scale.astype(jnp.float32) + 1.0)[:, None, :]
    m_dxhat = jnp.mean(dxhat, axis=1, keepdims=True)
    m_dxhat_xhat = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx3 = rstd * (dxhat - m_dxhat - xhat * m_dxhat_xhat)
    return (dx3.reshape(shape).astype(x.dtype),
            dscale.astype(scale.dtype), dbias.astype(bias.dtype))


fused_adain.defvjp(_fused_adain_fwd, _fused_adain_bwd)


def fused_adain_fits_vmem(shape, dtype) -> bool:
    """Whether the one-slab-per-sample strategy fits VMEM.  Lanes pad to
    128, so a (HW, C<128) slab occupies HW x 128 elements; with input +
    output + double buffering the practical budget is ~2 MB per buffer
    (measured: the 128^2 x 32 bf16 site at 4 MB crashes the compiler)."""
    import numpy as np

    hw = int(np.prod(shape[1:-1]))
    c = max(int(shape[-1]), 128)
    return hw * c * jnp.dtype(dtype).itemsize <= 2 * 1024 * 1024


def resolve_adain_impl(name: str = "auto") -> str:
    """"pallas" | "xla" | "auto".  Env override: CONFIGNET_TPU_ADAIN_IMPL.

    "auto" resolves to XLA: the fused kernel was measured IN-MODEL at 36.0
    ms/fwd vs XLA's 32.0 (B=256 bf16 256px generator) — the grid-(B,)
    launch pattern and the lost fusion with neighboring elementwise ops
    outweigh the one-pass HBM saving (docs/ROADMAP.md item 0).  The kernel
    stays as an opt-in experiment and a VMEM-residency reference."""
    name = os.environ.get("CONFIGNET_TPU_ADAIN_IMPL", name or "auto")
    if name == "auto":
        return "xla"
    if name not in ("pallas", "xla"):
        raise ValueError(f"unknown adain impl {name!r}")
    return name
