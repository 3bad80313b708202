"""3D convolution with a selectable lowering strategy.

The generator's FLOP budget is dominated by four 3x3x3 convolutions on
8^3/16^3 feature volumes (models/generator.py; reference architecture:
confignet/dnn_models/hologan_generator.py:139-154).  XLA lowers
``lax.conv_general_dilated`` with three spatial dims directly; the round-3
on-chip A/B (docs/SCALING.md "conv3d lowering A/B") measured it at
115-170 TFLOP/s across the generator's shapes — up to 86% of v5e bf16
peak, beating both alternative lowerings here on every shape.

``conv3d_zdecomp`` re-expresses the 3D conv as a sum over the kernel's
depth taps of 2D convolutions with the batch and depth axes merged:

    out[b, z, h, w, o] = sum_dz conv2d(x_pad[b, z+dz], k[dz])[h, w, o]

Each 2D conv runs at batch B*D with the same (H, W) window — a shape
XLA's TPU conv emitter tiles near-optimally.  The decomposition is exact
(same multiply-accumulate set, reassociated per depth tap).

``Conv3d`` is a drop-in for ``flax.linen.Conv`` restricted to what the
generator uses (stride 1, SAME padding, no dilation/grouping) with an
IDENTICAL parameter pytree ({"kernel": (kd,kh,kw,Ci,Co), "bias": (Co,)}),
so checkpoints and reference imports are interchangeable across ``impl``.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen import dtypes as flax_dtypes


def conv3d_xla(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Plain XLA 3D conv, stride 1, SAME (NDHWC / DHWIO)."""
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def conv3d_zdecomp(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depth-tap decomposition of a stride-1 SAME 3D conv.

    x: (B, D, H, W, Ci); kernel: (kd, kh, kw, Ci, Co).  Exact (the same
    MACs, reassociated per depth tap); each tap is a (B*D, H, W, Ci)
    2D conv — the TPU-friendly shape.
    """
    b, d, h, w, ci = x.shape
    kd = kernel.shape[0]
    lo = (kd - 1) // 2
    hi = kd - 1 - lo
    xp = jnp.pad(x, ((0, 0), (lo, hi), (0, 0), (0, 0), (0, 0)))
    out = None
    for dz in range(kd):
        xs = xp[:, dz : dz + d].reshape(b * d, h, w, ci)
        o = jax.lax.conv_general_dilated(
            xs, kernel[dz], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = o if out is None else out + o
    return out.reshape(b, d, h, w, -1)


_IMPLS = {"xla": conv3d_xla, "zdecomp": conv3d_zdecomp}

_KERNEL_INIT = nn.initializers.glorot_uniform()
_BIAS_INIT = nn.initializers.zeros


def resolve_conv3d_impl(name: str) -> str:
    """"auto" -> the measured-best lowering per backend.

    "xla" everywhere, by measurement: the round-3 on-chip A/B
    (docs/SCALING.md) has native conv3d winning all three generator
    shapes (170/151/115 TFLOP/s vs zdecomp's 117/143/71).  zdecomp stays
    wired and parity-tested (tests/test_conv3d.py) as the escape hatch
    for a toolchain where the 3-spatial-dim emitter regresses.
    """
    if name == "auto":
        return "xla"
    if name not in _IMPLS:
        raise ValueError(f"unknown conv3d impl {name!r} (xla|zdecomp|auto)")
    return name


class Conv3d(nn.Module):
    """stride-1 SAME 3D conv, parameter-compatible with ``nn.Conv``.

    ``impl``: "xla" | "zdecomp" | "auto" (resolved at trace time via
    :func:`resolve_conv3d_impl`).
    """

    features: int
    kernel_size: Sequence[int]
    dtype: Optional[jnp.dtype] = None
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ksize: Tuple[int, ...] = tuple(self.kernel_size)
        assert len(ksize) == 3, "Conv3d requires a rank-3 kernel_size"
        # Same initializers as every conv in this package (blocks.KERNEL_INIT/
        # BIAS_INIT); module-level here, not dataclass fields — plain-function
        # initializers stored on the class would bind as methods.
        kernel = self.param(
            "kernel", _KERNEL_INIT, ksize + (x.shape[-1], self.features)
        )
        bias = self.param("bias", _BIAS_INIT, (self.features,))
        # Same promotion rule as nn.Conv: inputs/params meet at self.dtype.
        x, kernel, bias = flax_dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        out = _IMPLS[resolve_conv3d_impl(self.impl)](x, kernel)
        return out + bias
