"""Generate ``assets/hdri_model.pck`` — a fitted HDRI PCA model asset.

The reference ships ``assets/hdri_model_20200116.pck`` only as a missing
large blob (referenced from hdri_encoding/process_hdri_metadata.py:61), so
its actual training HDRIs are unavailable.  This script regenerates a
working stand-in from procedural equirectangular environment maps (sky
gradient + sun disc + ground bounce + low-frequency clouds) so that the
HDRI-metadata pipeline (``python -m confignet_tpu.hdri.cli
process-metadata``) runs out of the box.  Deterministic: seeded RNG.

Usage: python setup/generate_hdri_model_asset.py [--n_hdris 120]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from confignet_tpu.hdri.pca import HDRIModelPCA  # noqa: E402


def make_procedural_hdri(rng: np.random.Generator, height: int = 128,
                         width: int = 256) -> np.ndarray:
    """One synthetic equirectangular HDR environment map (H, W, 3) float32."""
    v = np.linspace(0.0, 1.0, height)[:, None]          # 0 = zenith
    u = np.linspace(0.0, 2 * np.pi, width)[None, :]

    # Sky: vertical gradient between a horizon and a zenith color.
    zenith = rng.uniform(0.2, 1.2, 3)
    horizon = rng.uniform(0.5, 2.5, 3)
    sky = zenith[None, None] * (1 - v[..., None]) + horizon[None, None] * v[..., None]

    # Sun: a bright disc at a random elevation/azimuth, HDR intensity.
    sun_u = rng.uniform(0, 2 * np.pi)
    sun_v = rng.uniform(0.15, 0.55)
    sun_sigma = rng.uniform(0.01, 0.05)
    ang = np.minimum(np.abs(u - sun_u), 2 * np.pi - np.abs(u - sun_u))
    d2 = (ang / np.pi) ** 2 + (v - sun_v) ** 2
    sun_color = rng.uniform(5.0, 60.0) * rng.uniform(0.7, 1.0, 3)
    sun = np.exp(-d2 / (2 * sun_sigma**2))[..., None] * sun_color[None, None]

    # Clouds: a couple of low-frequency longitude harmonics.
    clouds = np.zeros((height, width))
    for k in range(1, 4):
        clouds += rng.uniform(0, 0.3) * np.cos(k * u + rng.uniform(0, 2 * np.pi)) \
            * np.sin(np.pi * v)
    clouds = np.clip(clouds, 0, None)[..., None] * rng.uniform(0.5, 1.5, 3)[None, None]

    # Ground: darker albedo below the horizon line.
    ground_mask = (v > rng.uniform(0.55, 0.7))[..., None]
    ground = rng.uniform(0.05, 0.4, 3)[None, None] * np.ones((height, width, 3))

    img = np.where(ground_mask, ground, sky + sun + clouds)
    return img.astype(np.float32)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_hdris", type=int, default=120)
    parser.add_argument("--n_components", type=int, default=50)
    parser.add_argument("--n_rotations_per_image", type=int, default=2)
    parser.add_argument(
        "--output_path", default=os.path.join(REPO_ROOT, "assets", "hdri_model.pck"))
    args = parser.parse_args()

    rng = np.random.default_rng(20200116)
    np.random.seed(20200116)  # apply_random_rotations uses np.random
    hdris = np.stack([make_procedural_hdri(rng) for _ in range(args.n_hdris)])

    model = HDRIModelPCA(output_shape=(64, 128),
                         n_rotations_per_image=args.n_rotations_per_image)
    model.fit(hdris, n_components=args.n_components)
    model.save(args.output_path)
    size_mb = os.path.getsize(args.output_path) / 1e6
    print(f"wrote {args.output_path} ({size_mb:.1f} MB)")


if __name__ == "__main__":
    main()
