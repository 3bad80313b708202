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
    # Full reference blendshape space (metrics/blendshape_names.py, 62
    # dims): the named expression dims (jaw_opening, mouthSmile*,
    # mouthFrown*, EyeBLink*/EyeWide*) genuinely move pixels; the rest are
    # identity noise the generator must learn to ignore — mirroring how
    # most reference blendshape dims barely move pixels.  Using the real
    # names means the Table-2 controllability protocol (dict-valued
    # blendshape overrides, metrics/controllability_metric_configs.py)
    # runs on this family unchanged.
    "blendshape_values": 62,
    "head_hair_color": 3,
    "eye_color": 3,
    # 9-dim beard PCA space (first component drives a rendered mustache,
    # matching the mustache_config exemplars' dominant axis).
    "beard_style_embedding": 9,
    # face width / height / skin tone / vertical feature placement
    "geometry_identity_params": 4,
}

# CelebA-style attribute labels derivable from the render parameters —
# exactly the 8 driven attributes of the controllability protocol, so a
# classifier trained on (imgs, attributes) is a procedural judge for it.
ATTRIBUTE_NAMES = [
    "Black_Hair", "Blond_Hair", "Brown_Hair", "Gray_Hair",
    "Mouth_Slightly_Open", "Smiling", "Narrow_Eyes", "Mustache",
]

# The protocol's hair-color parameter anchors
# (controllability_metric_configs.py set-values); labels use
# nearest-anchor classification in the SAME parameter space the renderer
# colors from, so judge and protocol agree by construction.
HAIR_COLOR_ANCHORS = {
    "Black_Hair": np.array([0.0, 1.0, 0.0], np.float32),
    "Blond_Hair": np.array([0.0, 0.1, 0.1], np.float32),
    "Brown_Hair": np.array([0.0, 0.6, 0.5], np.float32),
    "Gray_Hair": np.array([0.7, 0.7, 0.0], np.float32),
}


def _blendshape_idx(name: str) -> int:
    from confignet_tpu.metrics.blendshape_names import blendshape_names

    return blendshape_names.index(name)


def _expression_scalars(blendshapes: np.ndarray) -> Dict[str, float]:
    """Named expression drivers from a 62-dim blendshape vector."""
    bs = np.asarray(blendshapes, np.float32)
    pick = lambda n: float(bs[_blendshape_idx(n)])
    jaw_open = float(np.clip(pick("jaw_opening"), 0.0, 1.0))
    smile = float(np.clip(
        0.5 * (pick("mouthSmileLeft") + pick("mouthSmileRight")), 0.0, 1.0))
    frown = float(np.clip(
        0.5 * (pick("mouthFrownLeft") + pick("mouthFrownRight")), 0.0, 1.0))
    blink = float(np.clip(
        0.5 * (pick("EyeBLinkLeft") + pick("EyeBLinkRight")), 0.0, 1.0))
    wide = float(np.clip(
        0.5 * (pick("EyeWideLeft") + pick("EyeWideRight")), 0.0, 1.0))
    # The SAME eye-opening scalar drives the renderer's lids and the
    # Narrow_Eyes label — labels must describe rendered pixels, not raw
    # blendshapes (a blink countered by EyeWide renders open eyes).
    eye_open = float(np.clip(1.0 - 0.75 * blink + 0.5 * wide, 0.15, 1.5))
    return {"jaw_open": jaw_open, "smile": smile, "frown": frown,
            "blink": blink, "wide": wide, "eye_open": eye_open}


def _mustache_opacity(params: Dict[str, np.ndarray]) -> float:
    """Rendered mustache opacity from the first beard-PCA component.
    Shared by the renderer and derive_attributes so the Mustache label can
    never disagree with the drawn pixels."""
    return 1.0 / (1.0 + np.exp(-2.0 * float(params["beard_style_embedding"][0])))


def derive_attributes(params: Dict[str, np.ndarray]) -> Dict[str, int]:
    """Binary CelebA-style labels from render parameters (the ground truth
    the procedural attribute judge trains against)."""
    expr = _expression_scalars(params["blendshape_values"])
    hair = np.asarray(params["head_hair_color"], np.float32)
    dists = {name: float(np.linalg.norm(hair - anchor))
             for name, anchor in HAIR_COLOR_ANCHORS.items()}
    nearest = min(dists, key=dists.get)
    labels = {name: int(name == nearest) for name in HAIR_COLOR_ANCHORS}
    # 0.35, not ~0: a jaw_open of 0.1 renders a ~1px opening at 256px —
    # label-invisible — and puts ~90% of uniform draws in the positive
    # class.  0.35 gives a clearly-rendered opening AND ~2:1 balance.
    labels["Mouth_Slightly_Open"] = int(expr["jaw_open"] > 0.35)
    labels["Smiling"] = int(expr["smile"] > 0.5)
    labels["Narrow_Eyes"] = int(expr["eye_open"] < 0.74)
    labels["Mustache"] = int(_mustache_opacity(params) > 0.5)
    return labels


def _render_face(size: int, yaw: float, pitch: float, params: Dict[str, np.ndarray],
                 canvas_seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """One (image, eye_mask) pair.  All geometry in fractional coordinates so
    the family is resolution-independent."""
    import cv2

    expr = _expression_scalars(params["blendshape_values"])
    jaw_open, smile = expr["jaw_open"], expr["smile"]
    mustache = _mustache_opacity(params)
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
    # lids: blink narrows the eye opening, wide opens it further
    # Lid height uses a 1.6-power curve so Narrow_Eyes renders as a clear
    # slit (eye_open 0.15 -> ~0.3px vs ~0.8px linear at 256px) while wide
    # eyes open further — the round-5 judge could barely separate the
    # linear rendering on clean GT (acc 0.72).
    eye_open = expr["eye_open"]
    lid_h = 0.024 * eye_open ** 1.6
    for side in (-1, 1):
        ex = cx + side * eye_dx + eye_shift
        E((ex, eye_y), (0.035, lid_h), (245, 245, 245))
        E((ex, eye_y), (0.016, min(0.016, lid_h)), eye, mask=eye_mask)

    # mouth: width follows smile (frown narrows it), opening follows jaw_open
    mouth_y = cy + 0.16 + feat_y
    mouth_w = 0.07 * (1.0 + 0.6 * smile) * (1.0 - 0.4 * expr["frown"])
    mouth_h = 0.006 + 0.055 * jaw_open
    E((cx + eye_shift, mouth_y), (mouth_w, mouth_h), (40, 40, 150))
    # smile: an up-curved corner stroke (lower ellipse arc, the "U" shape)
    # whose span/thickness grow with the smile scalar — curvature is the
    # judge-visible cue; width alone is confounded with head width and yaw
    # (round-5 judge GT acc on Smiling was chance with width-only).
    if smile > 0.05:
        c = (int((cx + eye_shift) * size), int((mouth_y - 0.01) * size))
        a = (max(1, int(mouth_w * (1.0 + 0.3 * smile) * size)),
             max(1, int((0.015 + 0.035 * smile) * size)))
        cv2.ellipse(img, c, a, 0, 15, 165, (40, 40, 150),
                    max(1, int(smile * 0.012 * size)))

    # mustache: dark band above the mouth, opacity driven by the first
    # beard-PCA component (the axis separating the protocol's exemplars).
    # Draw exactly when the Mustache label is positive (opacity > 0.5, so
    # every drawn band is clearly visible) — threshold shared with
    # derive_attributes via _mustache_opacity.
    if mustache > 0.5:
        dark = np.array([30, 25, 20], np.float32)
        blended = skin * (1.0 - mustache) + dark * mustache
        E((cx + eye_shift, mouth_y - 0.055), (mouth_w * 1.2, 0.018), blended)

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

        self.attributes = []
        named_dims = [
            _blendshape_idx(n)
            for n in ("jaw_opening", "mouthSmileLeft", "mouthSmileRight",
                      "mouthFrownLeft", "mouthFrownRight", "EyeBLinkLeft",
                      "EyeBLinkRight", "EyeWideLeft", "EyeWideRight")
        ]
        anchors = list(HAIR_COLOR_ANCHORS.values())
        for i in range(n_images):
            # Blendshapes: identity noise everywhere, strong uniform drive on
            # the named expression dims so both attribute classes appear.
            bs = rng.normal(0, 0.2, FACEMODEL_DIMS["blendshape_values"]).astype(np.float32)
            bs[named_dims] = rng.uniform(0, 1, len(named_dims))
            # Hair: half near a protocol anchor (clear class), half uniform.
            if rng.random() < 0.5:
                hair = np.clip(
                    anchors[rng.integers(len(anchors))]
                    + rng.normal(0, 0.08, 3).astype(np.float32), 0, 1)
            else:
                hair = rng.uniform(0, 1, 3)
            beard = rng.normal(0, 0.5, FACEMODEL_DIMS["beard_style_embedding"])
            beard[0] = rng.uniform(-1.5, 1.5)  # mustache axis, both classes
            params = {
                "blendshape_values": bs,
                "head_hair_color": hair.astype(np.float32),
                "eye_color": rng.uniform(0, 1, 3).astype(np.float32),
                "beard_style_embedding": beard.astype(np.float32),
                "geometry_identity_params": rng.uniform(-1, 1, 4).astype(np.float32),
            }
            for name, value in params.items():
                self.metadata_inputs[name][i] = value
            self.attributes.append(derive_attributes(params))
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

    def get_attribute_values(self, sample_idxs, attribute_names) -> np.ndarray:
        """(n, len(attribute_names)) binary labels — the judge-training
        contract of CelebaAttributeClassifier.sample_batch_from_dataset."""
        return np.array(
            [[self.attributes[i][name] for name in attribute_names]
             for i in sample_idxs], np.float32)

    def facemodel_inputs_config(self) -> Dict[str, Tuple[int, int]]:
        """A facemodel_inputs table sized for this dataset (latent slice
        sizes roughly proportional to the reference's input:latent ratios)."""
        latent = {"blendshape_values": 8, "head_hair_color": 4,
                  "eye_color": 4, "beard_style_embedding": 4,
                  "geometry_identity_params": 6}
        return {name: (dim, latent[name]) for name, dim in FACEMODEL_DIMS.items()}
