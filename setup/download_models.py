"""Fetch pretrained model weights.

Reference counterpart: setup/download_models.py (pretrained ConfigNet models
from the reference's GitHub release).  For this framework two kinds of
weights matter:

1. The reference release ``model.zip`` (confignet_256/512, latentgan_256/512,
   attribute_classifier) — import it with
   ``confignet_tpu.core.reference_import.load_reference_confignet``.
2. The standard Keras backbone weights (VGG19, VGGFace VGG16, ResNet50,
   InceptionV3, MobileNetV2) that power the perceptual losses, encoder and
   metrics — import with ``confignet_tpu.models.backbones.loader``.

This script downloads both sets when network access is available.
"""
from __future__ import annotations

import argparse
import os
import sys
import urllib.request
import zipfile

REFERENCE_RELEASE_URL = (
    "https://github.com/microsoft/ConfigNet/releases/download/v1.0.0/model.zip"
)

KERAS_BASE = "https://storage.googleapis.com/tensorflow/keras-applications"
BACKBONE_URLS = {
    "vgg19_notop.h5": f"{KERAS_BASE}/vgg19/vgg19_weights_tf_dim_ordering_tf_kernels_notop.h5",
    "resnet50_notop.h5": f"{KERAS_BASE}/resnet/resnet50_weights_tf_dim_ordering_tf_kernels_notop.h5",
    "inception_v3_notop.h5": f"{KERAS_BASE}/inception_v3/inception_v3_weights_tf_dim_ordering_tf_kernels_notop.h5",
    "mobilenet_v2_notop.h5": f"{KERAS_BASE}/mobilenet_v2/mobilenet_v2_weights_tf_dim_ordering_tf_kernels_1.0_224_no_top.h5",
    "vggface_vgg16_notop.h5": (
        "https://github.com/rcmalli/keras-vggface/releases/download/v2.0/"
        "rcmalli_vggface_tf_notop_vgg16.h5"
    ),
}

REPO_ROOT = os.path.join(os.path.dirname(__file__), "..")


def _download(url: str, dest: str) -> None:
    if os.path.exists(dest):
        print(f"exists, skipping: {dest}")
        return
    print(f"Downloading {url} -> {dest}")
    urllib.request.urlretrieve(url, dest)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--models_dir", default=os.path.join(REPO_ROOT, "models"))
    parser.add_argument("--backbones_dir", default=os.path.join(REPO_ROOT, "pretrained"))
    parser.add_argument("--skip_reference_release", action="store_true")
    parser.add_argument("--skip_backbones", action="store_true")
    args = parser.parse_args(argv)

    if not args.skip_reference_release:
        os.makedirs(args.models_dir, exist_ok=True)
        zip_path = os.path.join(args.models_dir, "model.zip")
        _download(REFERENCE_RELEASE_URL, zip_path)
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(args.models_dir)
        print(f"Reference models extracted to {args.models_dir}")

    if not args.skip_backbones:
        os.makedirs(args.backbones_dir, exist_ok=True)
        for name, url in BACKBONE_URLS.items():
            _download(url, os.path.join(args.backbones_dir, name))
        print(f"Backbone weights in {args.backbones_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])
