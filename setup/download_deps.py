"""Download the OpenFace landmark-detector binary (the only native external
dependency, used by the default landmark backend).

Reference counterpart: setup/download_deps.py.  Linux users should install
OpenFace from source (https://github.com/TadasBaltrusaitis/OpenFace) and
point ``--openface_path`` / ``FaceImageNormalizer`` at ``FaceLandmarkImg``;
this script fetches the Windows x64 build like the reference does.

The fully offline alternative: ``--landmark_backend fake`` on the dataset
CLI runs the whole pipeline without OpenFace.
"""
from __future__ import annotations

import argparse
import os
import sys
import urllib.request
import zipfile

OPENFACE_URL = (
    "https://github.com/TadasBaltrusaitis/OpenFace/releases/download/"
    "OpenFace_2.2.0/OpenFace_2.2.0_win_x64.zip"
)
PATCH_EXPERT_FILES = [
    "cen_patches_0.25_of.dat",
    "cen_patches_0.35_of.dat",
    "cen_patches_0.50_of.dat",
    "cen_patches_1.00_of.dat",
]
PATCH_EXPERT_URL = "https://www.cs.cmu.edu/~face/OpenFace/models/"

REPO_ROOT = os.path.join(os.path.dirname(__file__), "..")
THIRD_PARTY_DIR = os.path.join(REPO_ROOT, "3rd_party")


def _download(url: str, dest: str) -> None:
    print(f"Downloading {url} -> {dest}")
    urllib.request.urlretrieve(url, dest)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", default=THIRD_PARTY_DIR)
    args = parser.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    zip_path = os.path.join(args.output_dir, "OpenFace_2.2.0_win_x64.zip")
    if not os.path.exists(zip_path):
        _download(OPENFACE_URL, zip_path)
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(args.output_dir)

    model_dir = os.path.join(
        args.output_dir, "OpenFace_2.2.0_win_x64", "model", "patch_experts"
    )
    os.makedirs(model_dir, exist_ok=True)
    for name in PATCH_EXPERT_FILES:
        dest = os.path.join(model_dir, name)
        if not os.path.exists(dest):
            _download(PATCH_EXPERT_URL + name, dest)
    print("OpenFace setup complete")


if __name__ == "__main__":
    main(sys.argv[1:])
