"""Auxiliary-subsystem units: evaluation path discovery, profiler hooks,
and the remote-logging fallbacks (SURVEY.md §5.1/§5.5/§2.7)."""
import os

import numpy as np

from confignet_tpu.apps.evaluation_utils import get_model_paths
from confignet_tpu.core.profiling import maybe_trace
from confignet_tpu.core.remote_logging import get_aml_run, log_job_params, log_losses


def test_get_model_paths(tmp_path):
    # a file path passes through untouched
    single = tmp_path / "model.json"
    single.write_text("{}")
    assert get_model_paths(str(single)) == [str(single)]

    # directory: recursive glob, digit-suffix filter mirrors the reference's
    # checkpoint naming (model_000123.json)
    sub = tmp_path / "ckpts"
    sub.mkdir()
    ckpt = sub / "model_000123.json"
    ckpt.write_text("{}")
    plain = sub / "config.json"
    plain.write_text("{}")

    filtered = get_model_paths(str(tmp_path))
    assert str(ckpt) in filtered and str(plain) not in filtered

    unfiltered = get_model_paths(str(tmp_path), names_with_digits_only=False)
    assert {str(ckpt), str(plain), str(single)} <= set(unfiltered)


def test_maybe_trace_noop_and_live(tmp_path):
    with maybe_trace(None):
        pass  # no-op context

    trace_dir = str(tmp_path / "trace")
    import jax

    with maybe_trace(trace_dir):
        jax.block_until_ready(jax.numpy.ones((8, 8)) @ jax.numpy.ones((8, 8)))
    walked = [os.path.join(d, f) for d, _, fs in os.walk(trace_dir) for f in fs]
    assert walked, "profiler produced no trace files"


def test_remote_logging_offline_fallbacks():
    # azureml isn't installed here: the context is None and the loggers
    # must be safe no-ops (reference: azure_ml_utils.py:8-14)
    run = get_aml_run()
    assert run is None

    class Args:
        lr = 0.1

    log_job_params(None, Args())
    log_losses(None, ["g"], [np.float32(1.0)])

    class FakeRun:
        def __init__(self):
            self.logged = {}

        def log(self, name, value):
            self.logged[name] = value

    fake = FakeRun()
    log_losses(fake, ["g", "d"], [1.0, 2.0], prefix="train_")
    assert fake.logged == {"train_g": 1.0, "train_d": 2.0}


def test_checkpoint_worker_orders_and_propagates_errors():
    import pytest

    from confignet_tpu.core.async_checkpoint import CheckpointWorker

    w = CheckpointWorker()
    out = []
    for i in range(5):
        w.submit(lambda i=i: out.append(i))
    w.drain()
    assert out == [0, 1, 2, 3, 4]

    w.submit(lambda: 1 / 0)
    with pytest.raises(RuntimeError):
        w.drain()
    # the worker survives a failed job
    w.submit(lambda: out.append(9))
    w.drain()
    assert out[-1] == 9
    w.close()


def test_import_release_gate_stages_without_artifacts(tmp_path):
    """make import-release exits 2 ("staged") with a clear report when the
    release artifacts are absent, without invoking pytest or the demo."""
    import subprocess
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    result = subprocess.run(
        [sys.executable, os.path.join(repo_root, "setup", "import_release.py")],
        env={**os.environ, "CONFIGNET_TPU_MODELS_DIR": str(tmp_path),
             "CONFIGNET_TPU_BACKBONES_DIR": str(tmp_path)},
        capture_output=True, text=True, timeout=120,
    )
    assert result.returncode == 2, result.stdout + result.stderr
    assert "No release artifacts found" in result.stdout
    for d in ("confignet_256", "latentgan_512", "attribute_classifier"):
        assert d in result.stdout


def test_import_release_unzips_model_zip(tmp_path):
    """A models/model.zip is unpacked in place (incl. the nested models/
    layout some releases use) before the artifact check."""
    import io
    import sys
    import zipfile

    models_dir = tmp_path / "models"
    models_dir.mkdir()
    with zipfile.ZipFile(models_dir / "model.zip", "w") as zf:
        zf.writestr("models/confignet_256/model.json", "{}")

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "setup"))
    try:
        import importlib

        import import_release

        importlib.reload(import_release)
        old = import_release.MODELS_DIR
        import_release.MODELS_DIR = str(models_dir)
        try:
            import_release._unzip_if_needed()
        finally:
            import_release.MODELS_DIR = old
    finally:
        sys.path.pop(0)
    assert (models_dir / "confignet_256" / "model.json").exists()
