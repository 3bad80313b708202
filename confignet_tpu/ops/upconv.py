"""Fused nearest-2x-upsample + conv ("subpixel" lowering).

Every conv in the generator's upsample chain sits directly after a
nearest-neighbour 2x upsample (models/generator.py; reference:
confignet/dnn_models/hologan_generator.py:139-170, Keras
``UpSampling3D``/``UpSampling2D`` + ``Conv3D``/``Conv2D``).  Convolving a
nearest-upsampled tensor is algebraically redundant: adjacent kernel taps
read the *same* source pixel, so the pair rewrites exactly as a conv on
the SMALL grid with per-output-phase kernels whose taps are sums of the
original taps, followed by a depth-to-space interleave:

    conv_same(up2(x), W) == depth_to_space(conv(x, W'), 2)

where, per spatial dim, output parity r in {0, 1} selects a collapsed
1-D tap vector (derivation for TF/XLA "SAME" padding, ``u[q] = x[q//2]``):

    k=3 (3D blocks, pad 1+1):  r=0: [W0, W1+W2]      at offsets {-1, 0}
                               r=1: [W0+W1, W2]      at offsets { 0,+1}
    k=4 (2D blocks, pad 1+2):  r=0: [W0, W1+W2, W3]  at offsets {-1,0,+1}
                               r=1: [0,  W0+W1, W2+W3]

The rewrite is exact (identical MAC set, reassociated) and keeps the
parameter pytree byte-identical to the naive path, so checkpoints and
reference imports are interchangeable across ``impl``.  What it buys on
TPU:

- 3D (the generator's FLOP peak, 17 ms of the 44 ms B=256 forward):
  per-phase kernels have 2 taps/dim instead of 3 on a 2x-denser grid —
  (D+1)^3 * 8 phases * 8 taps vs (2D)^3 * 27 taps = **2.4x fewer FLOPs**
  at D=8 (map_3d_1), 1.7x at D=4 (map_3d_0).
- 2D (the HBM-bound tail): the 4x-larger upsampled tensor is never
  materialised in HBM — the conv reads the small tensor (1.78x fewer
  FLOPs too: 9 taps * 4 phases vs 16 taps * 4 output pixels).

``resolve_upconv_impl("auto")`` picks the measured-best lowering;
``naive`` (materialise the upsample, then the stock conv) remains wired
as the escape hatch and the parity oracle (tests/test_upconv.py).
"""
from __future__ import annotations

import itertools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.linen import dtypes as flax_dtypes

from confignet_tpu.ops.resample import upsample2d_nearest, upsample3d_nearest

_KERNEL_INIT = nn.initializers.glorot_uniform()
_BIAS_INIT = nn.initializers.zeros

# Per-dim tap-collapse matrices T[r]: (n_out_taps, k) such that the
# phase-r collapsed kernel is T[r] @ W along that spatial dim.
_T_K3 = (
    np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]]),  # r=0: [W0, W1+W2]
    np.array([[1.0, 1.0, 0.0], [0.0, 0.0, 1.0]]),  # r=1: [W0+W1, W2]
)
_T_K4 = (
    # r=0: [W0, W1+W2, W3]; r=1: [0, W0+W1, W2+W3] (offsets -1, 0, +1)
    np.array([[1.0, 0, 0, 0], [0, 1.0, 1.0, 0], [0, 0, 0, 1.0]]),
    np.array([[0.0, 0, 0, 0], [1.0, 1.0, 0, 0], [0, 0, 1.0, 1.0]]),
)


def up2_conv2d_subpixel(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """conv_same(up2(x), kernel) for a 4x4 kernel, without materialising
    the upsample.  x: (B, H, W, Ci); kernel: (4, 4, Ci, Co) ->
    (B, 2H, 2W, Co).
    """
    b, h, w, ci = x.shape
    assert kernel.shape[:2] == (4, 4), "2D subpixel path is derived for k=4"
    co = kernel.shape[-1]
    t = [jnp.asarray(m, kernel.dtype) for m in _T_K4]
    # (ry, rx) phase kernels, ry-major to match the d2s interleave below.
    phases = [
        jnp.einsum("ay,bx,yxio->abio", t[ry], t[rx], kernel)
        for ry, rx in itertools.product((0, 1), (0, 1))
    ]
    kp = jnp.concatenate(phases, axis=-1)  # (3, 3, Ci, 4*Co)
    out = jax.lax.conv_general_dilated(
        x, kp, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = out.reshape(b, h, w, 2, 2, co)
    out = out.transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(b, 2 * h, 2 * w, co)


def up2_conv3d_subpixel(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """conv_same(up2(x), kernel) for a 3x3x3 kernel on the small grid.

    x: (B, D, H, W, Ci); kernel: (3, 3, 3, Ci, Co) -> (B, 2D, 2H, 2W, Co).
    One (2,2,2)-tap conv produces all 8 phases as channel groups at D+1
    positions per dim (out[j] = K0*x[j-1] + K1*x[j]); phase r along a dim
    reads position m + r, so each phase is a shifted D-window slice.
    """
    b, d, h, w, ci = x.shape
    assert kernel.shape[:3] == (3, 3, 3), "3D subpixel path is derived for k=3"
    co = kernel.shape[-1]
    t = [jnp.asarray(m, kernel.dtype) for m in _T_K3]
    phase_list = list(itertools.product((0, 1), repeat=3))  # rd-major
    phases = [
        jnp.einsum("ad,bh,cw,dhwio->abcio", t[rd], t[rh], t[rw], kernel)
        for rd, rh, rw in phase_list
    ]
    kp = jnp.concatenate(phases, axis=-1)  # (2, 2, 2, Ci, 8*Co)
    out = jax.lax.conv_general_dilated(
        x, kp, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )  # (B, D+1, H+1, W+1, 8*Co)
    parts = [
        out[:, rd : rd + d, rh : rh + h, rw : rw + w,
            i * co : (i + 1) * co]
        for i, (rd, rh, rw) in enumerate(phase_list)
    ]
    y = jnp.stack(parts, axis=4)  # (B, D, H, W, 8, Co)
    y = y.reshape(b, d, h, w, 2, 2, 2, co)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(b, 2 * d, 2 * h, 2 * w, co)


_VALID_IMPLS = ("naive", "subpixel")


def resolve_upconv_impl(name: str) -> str:
    """"auto" -> the measured-best lowering per backend.

    "subpixel" everywhere, by on-chip measurement (docs/SCALING.md
    "fused upsample+conv A/B"): the rewrite cuts the generator's two
    FLOP-peak 3D convs by 1.7-2.4x in FLOPs and never materialises the
    4x upsampled 2D tensors.  "naive" stays wired and equality-tested
    (tests/test_upconv.py) as the oracle / escape hatch.
    """
    if name == "auto":
        return "subpixel"
    if name not in _VALID_IMPLS:
        raise ValueError(f"unknown upconv impl {name!r} (naive|subpixel|auto)")
    return name


class UpConv(nn.Module):
    """Nearest-2x upsample followed by a stride-1 SAME conv, as one module.

    Parameter-compatible with ``nn.Conv``/``ops.conv3d.Conv3d`` of the
    same ``kernel_size`` ({"kernel": (*k, Ci, Co), "bias": (Co,)}), so a
    checkpoint trained with the unfused pair loads unchanged.  ``impl``:
    "naive" | "subpixel" | "auto".
    """

    features: int
    kernel_size: Sequence[int]
    dtype: Optional[jnp.dtype] = None
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ksize: Tuple[int, ...] = tuple(self.kernel_size)
        rank = len(ksize)
        assert rank in (2, 3), "UpConv supports rank-2 and rank-3 convs"
        kernel = self.param(
            "kernel", _KERNEL_INIT, ksize + (x.shape[-1], self.features)
        )
        bias = self.param("bias", _BIAS_INIT, (self.features,))
        # Collapse taps in the parameter dtype (f32) BEFORE promotion: the
        # tap sums then round once, staying closer to the naive path's f32
        # accumulate than summing already-rounded bf16 taps would.
        impl = resolve_upconv_impl(self.impl)
        x, kernel, bias = flax_dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        if impl == "subpixel":
            if rank == 2:
                out = up2_conv2d_subpixel(x, kernel)
            else:
                out = up2_conv3d_subpixel(x, kernel)
        else:
            if rank == 2:
                xu = upsample2d_nearest(x)
                out = jax.lax.conv_general_dilated(
                    xu, kernel, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            else:
                xu = upsample3d_nearest(x)
                out = jax.lax.conv_general_dilated(
                    xu, kernel, (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                )
        return out + bias
