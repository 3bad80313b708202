"""One-command acceptance gate for the official release artifacts.

The day the reference's released ``model.zip`` (and optionally the Keras
backbone ``.h5`` files) are available, this runs the full import-and-verify
chain (VERDICT r4 item 6):

  1. locate/unpack the release into ``models/`` (confignet_256/512,
     latentgan_256/512, attribute_classifier);
  2. run the gated pretrained tier — the strict Keras-order importer plus
     the golden-output contract from the reference's committed baselines
     (/root/reference/tests/inference_test.py:23-97, compared at
     perceptual tolerance; see tests/test_pretrained.py);
  3. smoke the demo CLI in --test_mode against the released checkpoints at
     every resolution present (the reference's evaluation_test.py demo
     coverage).

No training, no egress: everything here consumes artifacts already on
disk.  Exit code 0 = the release imports, reproduces the goldens, and
drives the demo.

Usage:
  make import-release
  # or, with artifacts elsewhere:
  CONFIGNET_TPU_MODELS_DIR=/path/to/models python setup/import_release.py
"""
from __future__ import annotations

import os
import subprocess
import sys
import zipfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODELS_DIR = os.environ.get(
    "CONFIGNET_TPU_MODELS_DIR", os.path.join(REPO_ROOT, "models")
)
RELEASE_DIRS = (
    "confignet_256", "confignet_512", "latentgan_256", "latentgan_512",
    "attribute_classifier",
)
BACKBONE_H5S = (
    "vgg19_weights_tf_dim_ordering_tf_kernels_notop.h5",
    "rcmalli_vggface_tf_notop_vgg16.h5",
    "resnet50_weights_tf_dim_ordering_tf_kernels_notop.h5",
    "inception_v3_weights_tf_dim_ordering_tf_kernels_notop.h5",
    "mobilenet_v2_weights_tf_dim_ordering_tf_kernels_1.0_224_no_top.h5",
)


def _unzip_if_needed() -> None:
    """Unpack models/model.zip (or $CONFIGNET_TPU_MODEL_ZIP) in place when
    the release dirs are missing but the zip is present."""
    zip_path = os.environ.get(
        "CONFIGNET_TPU_MODEL_ZIP", os.path.join(MODELS_DIR, "model.zip")
    )
    missing = [d for d in RELEASE_DIRS
               if not os.path.exists(os.path.join(MODELS_DIR, d, "model.json"))]
    if missing and os.path.exists(zip_path):
        print(f"unpacking {zip_path} -> {MODELS_DIR}")
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(MODELS_DIR)
        # releases sometimes nest under a top-level models/ folder
        nested = os.path.join(MODELS_DIR, "models")
        if os.path.isdir(nested):
            for entry in os.listdir(nested):
                os.replace(os.path.join(nested, entry),
                           os.path.join(MODELS_DIR, entry))


def _report_artifacts() -> bool:
    print(f"models dir: {MODELS_DIR}")
    any_present = False
    for d in RELEASE_DIRS:
        present = os.path.exists(os.path.join(MODELS_DIR, d, "model.json"))
        any_present |= present
        print(f"  {'OK     ' if present else 'MISSING'} {d}/model.json")

    backbones_dir = os.environ.get(
        "CONFIGNET_TPU_BACKBONES_DIR", os.path.join(REPO_ROOT, "pretrained")
    )
    print(f"backbones dir: {backbones_dir} (optional; random-init without)")
    for h5 in BACKBONE_H5S:
        present = os.path.exists(os.path.join(backbones_dir, h5))
        print(f"  {'OK     ' if present else 'absent '} {h5}")
    return any_present


def _run(description: str, cmd) -> bool:
    print(f"\n=== {description}\n$ {' '.join(cmd)}")
    return subprocess.call(cmd, cwd=REPO_ROOT) == 0


def main() -> int:
    _unzip_if_needed()
    if not _report_artifacts():
        print(
            "\nNo release artifacts found.  Download the reference release "
            "model.zip (see /root/reference/README.md:11 / "
            "setup/download_models.py) into models/ and re-run.  This rig "
            "has no egress, so the gate stays staged until then."
        )
        return 2

    ok = True

    # Importer + golden-output contract (strict shape checks at every
    # offset; encode/decode, attribute modification, 1-iter fine-tune and
    # LatentGAN sampling vs the reference's committed npz goldens).
    env = dict(os.environ, CONFIGNET_TPU_MODELS_DIR=MODELS_DIR)
    print("\n=== pretrained golden tier (tests/test_pretrained.py)")
    ok &= subprocess.call(
        [sys.executable, "-m", "pytest", "tests/test_pretrained.py",
         "-m", "pretrained", "-v"],
        cwd=REPO_ROOT, env=env,
    ) == 0

    # Demo smoke at each released resolution (LatentGAN sampling mode,
    # one headless frame — reference evaluation_test.py:32-36).
    for res in ("256", "512"):
        confignet = os.path.join(MODELS_DIR, f"confignet_{res}", "model.json")
        latentgan = os.path.join(MODELS_DIR, f"latentgan_{res}", "model.json")
        if not (os.path.exists(confignet) and os.path.exists(latentgan)):
            print(f"\n=== demo smoke {res}px: skipped (artifacts missing)")
            continue
        ok &= _run(
            f"demo smoke {res}px (test_mode, LatentGAN sampling)",
            [sys.executable, "-m", "confignet_tpu.apps.confignet_demo",
             "--test_mode", "--resolution", res,
             "--confignet_model_path", confignet,
             "--latent_gan_model_path", latentgan],
        )

    print("\n=== import-release:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
