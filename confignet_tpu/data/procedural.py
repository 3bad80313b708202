"""Procedurally rendered face-like dataset for training-quality evidence.

The reference trains on proprietary synthetic renders plus FFHQ, neither of
which is available in this environment (zero egress).  This module renders a
*parametric* face-like image family — skin-tone head ellipse, colored hair
cap, colored eyes, a mouth whose opening/width are driven by blendshape-style
parameters, the whole face shifted/squashed by yaw/pitch — with metadata in
exactly the trainer's facemodel-input format.  A convolutional GAN can
genuinely learn this distribution, so FID/KID trends and image panels over a
real training run demonstrate that the rebuilt adversarial training
*improves images*, not merely that the step runs (VERDICT r2 item 3).

Duck-type contract (what the trainers touch — see FakeDataset in
tests/helpers.py and NeuralRendererDataset in data/dataset.py):
``imgs`` (N,S,S,3) uint8 BGR, ``eye_masks`` (N,S,S) uint8,
``metadata_inputs`` name->(N,d) float32 incl. "rotations" (N,3),
``metadata_input_distributions`` name->sample(n), ``inception_features``
(None → InceptionMetrics recomputes live), ``attributes``.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from confignet_tpu.data.distributions import ExemplarDistribution

FACEMODEL_DIMS: Dict[str, int] = {
    # dims 0/1 drive the mouth (jaw_open, smile); the rest are identity noise
    # the generator must learn to ignore — mirroring how most reference
    # blendshape dims barely move pixels.
    "blendshape_values": 8,
    "head_hair_color": 3,
    "eye_color": 3,
    # face width / height / skin tone / vertical feature placement
    "geometry_identity_params": 4,
}


def _render_face(size: int, yaw: float, pitch: float, params: Dict[str, np.ndarray],
                 canvas_seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """One (image, eye_mask) pair.  All geometry in fractional coordinates so
    the family is resolution-independent."""
    import cv2

    jaw_open = float(np.clip(params["blendshape_values"][0], 0.0, 1.0))
    smile = float(np.clip(params["blendshape_values"][1], 0.0, 1.0))
    hair = np.clip(params["head_hair_color"], 0, 1) * 255.0
    eye = np.clip(params["eye_color"], 0, 1) * 255.0
    geom = params["geometry_identity_params"]
    w_scale = 1.0 + 0.25 * float(np.clip(geom[0], -1, 1))
    h_scale = 1.0 + 0.2 * float(np.clip(geom[1], -1, 1))
    skin_t = 0.5 + 0.5 * float(np.clip(geom[2], -1, 1))
    feat_y = 0.04 * float(np.clip(geom[3], -1, 1))

    # Deterministic background gradient (slight per-image brightness).
    rng = np.random.default_rng(canvas_seed)
    base = 40 + int(30 * rng.random())
    col = np.linspace(base, base + 60, size, dtype=np.float32)
    img = np.broadcast_to(col[:, None, None], (size, size, 3)).copy()

    skin = np.array([140, 160, 120]) * (0.7 + 0.6 * skin_t)  # BGR-ish skin
    skin = np.clip(skin, 0, 255)

    cx = 0.5 + 0.22 * np.sin(yaw)
    cy = 0.47 - 0.22 * np.sin(pitch)
    ax = 0.26 * w_scale * (1.0 - 0.25 * abs(np.sin(yaw)))
    ay = 0.33 * h_scale

    def E(center, axes, color, mask=None, thickness=-1):
        c = (int(center[0] * size), int(center[1] * size))
        a = (max(1, int(axes[0] * size)), max(1, int(axes[1] * size)))
        cv2.ellipse(img, c, a, 0, 0, 360, tuple(float(v) for v in color), thickness)
        if mask is not None:
            cv2.ellipse(mask, c, a, 0, 0, 360, 1, thickness)

    # hair cap: a larger ellipse behind/above the head
    E((cx, cy - 0.07 * h_scale), (ax * 1.15, ay * 1.05), hair)
    # head
    E((cx, cy), (ax, ay), skin)

    eye_mask = np.zeros((size, size), np.uint8)
    eye_dx = 0.105 * w_scale * np.cos(yaw)
    eye_y = cy - 0.06 + feat_y
    eye_shift = 0.045 * np.sin(yaw)  # both eyes slide with yaw (parallax)
    for side in (-1, 1):
        ex = cx + side * eye_dx + eye_shift
        E((ex, eye_y), (0.035, 0.022), (245, 245, 245))
        E((ex, eye_y), (0.016, 0.016), eye, mask=eye_mask)

    # mouth: width follows smile, opening follows jaw_open
    mouth_y = cy + 0.16 + feat_y
    mouth_w = 0.07 * (1.0 + 0.6 * smile)
    mouth_h = 0.008 + 0.05 * jaw_open
    E((cx + eye_shift, mouth_y), (mouth_w, mouth_h), (40, 40, 150))

    return img.astype(np.uint8), eye_mask


class ProceduralFaceDataset:
    """Duck-typed NeuralRendererDataset over the procedural face family."""

    def __init__(self, n_images: int = 1024, img_size: int = 256, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.imgs = np.zeros((n_images, img_size, img_size, 3), np.uint8)
        self.eye_masks = np.zeros((n_images, img_size, img_size), np.uint8)
        self.metadata_inputs: Dict[str, np.ndarray] = {
            name: np.zeros((n_images, dim), np.float32)
            for name, dim in FACEMODEL_DIMS.items()
        }
        rotations = np.zeros((n_images, 3), np.float32)
        # reference pose sampling ranges: yaw +-30deg, pitch +-10deg, roll 0
        rotations[:, 0] = rng.uniform(-np.pi / 6, np.pi / 6, n_images)
        rotations[:, 1] = rng.uniform(-np.pi / 18, np.pi / 18, n_images)
        self.metadata_inputs["rotations"] = rotations

        for i in range(n_images):
            params = {
                "blendshape_values": np.concatenate(
                    [rng.uniform(0, 1, 2), rng.normal(0, 0.3, 6)]
                ).astype(np.float32),
                "head_hair_color": rng.uniform(0, 1, 3).astype(np.float32),
                "eye_color": rng.uniform(0, 1, 3).astype(np.float32),
                "geometry_identity_params": rng.uniform(-1, 1, 4).astype(np.float32),
            }
            for name, value in params.items():
                self.metadata_inputs[name][i] = value
            self.imgs[i], self.eye_masks[i] = _render_face(
                img_size, rotations[i, 0], rotations[i, 1], params,
                canvas_seed=seed * 100003 + i,
            )

        self.metadata_input_distributions = {}
        for name, arr in self.metadata_inputs.items():
            dist = ExemplarDistribution()
            dist.fit(arr)
            self.metadata_input_distributions[name] = dist

        # None -> InceptionMetrics recomputes ground-truth features with the
        # live extractor, keeping GT/generated features consistent.
        self.inception_features: Optional[np.ndarray] = None
        self.attributes = None

    def facemodel_inputs_config(self) -> Dict[str, Tuple[int, int]]:
        """A facemodel_inputs table sized for this dataset (latent slice
        sizes roughly proportional to the reference's input:latent ratios)."""
        latent = {"blendshape_values": 8, "head_hair_color": 4,
                  "eye_color": 4, "geometry_identity_params": 6}
        return {name: (dim, latent[name]) for name, dim in FACEMODEL_DIMS.items()}
