"""Locating and applying pretrained Keras backbone weights.

``setup/download_models.py`` fetches the standard notop ``.h5`` files into a
directory (default ``pretrained/``); a ``backbones_dir`` config key on any
trainer applies whatever files are present there.  Missing files are skipped
silently — the backbones then keep their deterministic seeded init (this
build environment has no egress, so that is the tested default).

Reference behavior being reproduced: every reference backbone loads
ImageNet/VGGFace weights at construction (perceptual_loss.py:18-41,
real_encoder.py:13, inception_distance.py:11,
celeba_attribute_prediction.py:56).
"""
from __future__ import annotations

import os
from typing import Optional

BACKBONE_FILES = {
    "vgg19": "vgg19_notop.h5",
    "vggface": "vggface_vgg16_notop.h5",
    "inception_v3": "inception_v3_notop.h5",
    "mobilenet_v2": "mobilenet_v2_notop.h5",
    "resnet50": "resnet50_notop.h5",
}


def backbone_path(backbones_dir: Optional[str], key: str) -> Optional[str]:
    """Full path of the standard weight file for ``key`` if it exists."""
    if not backbones_dir:
        return None
    path = os.path.join(backbones_dir, BACKBONE_FILES[key])
    return path if os.path.exists(path) else None


def maybe_load(loader, backbones_dir: Optional[str], key: str) -> bool:
    """Call ``loader(path)`` when the weight file for ``key`` exists; report
    what happened so training logs show which backbones are pretrained."""
    path = backbone_path(backbones_dir, key)
    if path is None:
        return False
    loader(path)
    print(f"Loaded pretrained {key} backbone from {path}")
    return True
