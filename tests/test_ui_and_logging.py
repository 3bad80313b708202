"""Unit tests for the demo UI state machine (apps/basic_ui.py), the PRNG
key-chain (core/randomness.py) and the loss-logging sinks
(core/logging_utils.py) — previously covered only transitively through the
demo smoke test."""
import os

import numpy as np
import pytest

from confignet_tpu.apps.basic_ui import BasicUI, HdriTurntable, LatentInterpolator
from confignet_tpu.core.logging_utils import LossFlusher, log_loss_vals, update_loss_dict
from confignet_tpu.core.randomness import KeyChain


class _FakeModel:
    """The slice of ConfigNet that BasicUI touches."""

    def __init__(self, hdri_dim=None):
        inputs = {"blendshape_values": (8, 8), "bone_rotations:left_eye": (3, 3)}
        if hdri_dim:
            inputs["hdri_embedding"] = (hdri_dim, 10)
        self.config = {"facemodel_inputs": inputs}
        self.spliced = []

    def set_facemodel_param_in_latents(self, latents, name, value):
        self.spliced.append((name, np.asarray(value).copy()))
        return latents + 1.0


def test_latent_interpolator_glides_over_n_frames():
    interp = LatentInterpolator(n_frames=4)
    interp.retarget(np.zeros(3))
    np.testing.assert_allclose(interp.value(), 0.0)

    # retarget mid-glide starts from the *displayed* value, not the old target
    interp.retarget(np.ones(3))
    for expect in (0.25, 0.5, 0.75, 1.0):
        interp.advance()
        np.testing.assert_allclose(interp.value(), expect)
    interp.advance()  # saturates
    np.testing.assert_allclose(interp.value(), 1.0)

    interp.retarget(np.full(3, 3.0))
    interp.advance()
    interp.advance()
    np.testing.assert_allclose(interp.value(), 2.0)  # halfway 1 -> 3


def test_turntable_disabled_without_hdri_input(tmp_path):
    tt = HdriTurntable(_FakeModel(hdri_dim=None))
    tt.toggle()
    latent = np.zeros((1, 4))
    np.testing.assert_array_equal(tt.apply(latent), latent)  # no-op


def test_turntable_splices_and_wraps(tmp_path):
    frames = np.arange(6, dtype=np.float32).reshape(3, 2)
    path = str(tmp_path / "turntable.npy")
    np.save(path, frames)
    model = _FakeModel(hdri_dim=2)
    tt = HdriTurntable(model, path=path)

    latent = np.zeros((1, 4))
    np.testing.assert_array_equal(tt.apply(latent), latent)  # inactive
    tt.toggle()
    for expected_row in [0, 1, 2, 0]:  # wraps after 3 frames
        tt.apply(latent)
        np.testing.assert_array_equal(model.spliced[-1][1], frames[expected_row])


def test_turntable_dim_mismatch_disables(tmp_path):
    frames = np.zeros((3, 5), np.float32)  # model expects 2 dims
    path = str(tmp_path / "turntable.npy")
    np.save(path, frames)
    tt = HdriTurntable(_FakeModel(hdri_dim=2), path=path)
    tt.toggle()
    latent = np.zeros((1, 4))
    np.testing.assert_array_equal(tt.apply(latent), latent)


def test_basic_ui_key_dispatch():
    ui = BasicUI(_FakeModel(hdri_dim=None))
    assert "bone_rotations:left_eye" not in ui.facemodel_param_names

    ui.handle_key(ord("d"))
    ui.handle_key(ord("D"))  # uppercase folds to lowercase
    assert ui.rotation_offset[0, 0] == pytest.approx(0.10)
    ui.handle_key(ord("a"))
    assert ui.rotation_offset[0, 0] == pytest.approx(0.05)
    ui.handle_key(ord("k"))
    assert ui.eye_rotation_offset[0, 0] == pytest.approx(0.05)
    assert ui.rotation_offset[0, 1] == 0.0

    first = ui.current_attribute
    ui.handle_key(ord("c"))
    cycled = ui.current_attribute
    ui.handle_key(ord("z"))
    assert ui.current_attribute == first
    assert (cycled == first) == (len(ui.facemodel_param_names) == 1)

    assert not ui.exit
    ui.handle_key(27)
    assert ui.exit


def test_basic_ui_frame_latent_composes_glide_and_turntable():
    ui = BasicUI(_FakeModel(hdri_dim=None))
    ui.retarget(np.zeros((1, 4)))
    ui.retarget(np.ones((1, 4)))
    for _ in range(5):
        ui.advance()
    np.testing.assert_allclose(ui.frame_latent(), 1.0)


def test_keychain_deterministic_and_resumable():
    a, b = KeyChain(seed=7), KeyChain(seed=7)
    k1, k2 = a.next(), b.next()
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    a.next()
    resumed = KeyChain(seed=7, position=a.position)
    np.testing.assert_array_equal(np.asarray(resumed.next()), np.asarray(a.next()))
    # derived numpy generators are reproducible too
    x = KeyChain(seed=3).numpy_rng().normal(size=4)
    y = KeyChain(seed=3).numpy_rng().normal(size=4)
    np.testing.assert_array_equal(x, y)


def test_update_loss_dict_and_flusher():
    hist = {}
    update_loss_dict(hist, {"g": 1.0, "d": 2.0})
    update_loss_dict(hist, {"g": 3.0})
    assert hist == {"g": [1.0, 3.0], "d": [2.0]}

    flusher = LossFlusher(period=2)
    assert not flusher.append({"g": np.float32(1)})
    assert flusher.append({"g": np.float32(2)})  # period reached
    fetched = flusher.flush()
    assert [float(f["g"]) for f in fetched] == [1.0, 2.0]
    assert flusher.flush() == []


def test_log_loss_vals_writes_sinks(tmp_path):
    hist = {"loss_sum": [3.0, 2.0], "g": [1.0, 0.5]}
    seen = {}
    log_loss_vals(hist, str(tmp_path), step_number=2, prefix="G_",
                  extra_sink=lambda k, v: seen.__setitem__(k, v))
    assert seen == {"G_loss_sum": 2.0, "G_g": 0.5}
    table = np.loadtxt(tmp_path / "G_losses.txt")
    np.testing.assert_allclose(table, [[3.0, 1.0], [2.0, 0.5]])

    log_loss_vals(hist, str(tmp_path), step_number=2, prefix="D_")
    assert (tmp_path / "D_losses.png").exists()
    assert (tmp_path / "D_loss_sum.png").exists()


def test_log_loss_vals_long_history_downsampled(tmp_path):
    """Plot cost stays O(1) in run length: curves beyond MAX_PLOT_POINTS are
    strided down (round-4 checkpoint-cost fix) but files still land."""
    from confignet_tpu.core.logging_utils import MAX_PLOT_POINTS

    n = MAX_PLOT_POINTS * 3 + 7
    hist = {"loss_sum": list(np.linspace(10.0, 1.0, n)), "aux": [1.0] * n}
    log_loss_vals(hist, str(tmp_path), step_number=n, prefix="L_")
    assert (tmp_path / "L_losses.png").exists()
    assert (tmp_path / "L_loss_sum.png").exists()
    # txt table is NOT downsampled — it is the full-fidelity record
    table = np.loadtxt(tmp_path / "L_losses.txt")
    assert table.shape[0] == n
