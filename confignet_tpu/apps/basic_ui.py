"""Demo UI state machine: keyboard decoding, pose/gaze offsets, embedding
interpolation and the HDRI turntable sweep.

Reference: evaluation/basic_ui.py.  Key bindings: WSAD/QE head pose,
IKJL/UO gaze, Z/C cycle the controlled attribute, N toggles the HDRI sweep,
Esc exits.
"""
from __future__ import annotations

import os

import numpy as np

ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "assets")


class BasicUI:
    def __init__(self, confignet_model, hdri_turntable_path=None):
        self.confignet_model = confignet_model

        self.exit = False
        self.rotation_offset = np.zeros((1, 3))
        self.eye_rotation_offset = np.zeros((1, 3))
        self.controlled_param_idx = 0

        self.facemodel_param_names = list(confignet_model.config["facemodel_inputs"].keys())
        if "bone_rotations:left_eye" in self.facemodel_param_names:
            # eye rotation is controlled separately in the demo
            self.facemodel_param_names.remove("bone_rotations:left_eye")

        self.render_input_interp_0 = None
        self.render_input_interp_1 = None

        self.rotation_angle_step_size = 0.05
        self.interpolation_coef = 1.0
        self.n_interpolation_steps = 5
        self.interpolation_step_length = 1.0 / self.n_interpolation_steps

        if hdri_turntable_path is None:
            hdri_turntable_path = os.path.join(ASSET_DIR, "hdri_turntable_embeddings.npy")
        self.hdri_turntable_embeddings = None
        hdri_spec = confignet_model.config["facemodel_inputs"].get("hdri_embedding")
        if os.path.exists(hdri_turntable_path) and hdri_spec is not None:
            embeddings = np.load(hdri_turntable_path)
            if embeddings.shape[1] == hdri_spec[0]:
                self.hdri_turntable_embeddings = embeddings
            else:
                print(
                    "WARNING: turntable embeddings are %d-dim but the model's "
                    "hdri_embedding input is %d-dim; illumination sweep disabled"
                    % (embeddings.shape[1], hdri_spec[0])
                )
        self.current_hdri_embedding_frame = 0
        self.sweeping_hdri = False

    # ------------------------------------------------------------------

    def perform_per_frame_actions(self) -> None:
        if self.interpolation_coef < 1.0:
            self.interpolation_coef = min(
                self.interpolation_coef + self.interpolation_step_length, 1.0
            )

    def set_next_embeddings(self, embeddings) -> None:
        if self.render_input_interp_0 is None:
            self.render_input_interp_0 = embeddings
        else:
            self.render_input_interp_0 = self.get_current_frame_embeddings()
        self.render_input_interp_1 = embeddings
        self.interpolation_coef = 0

    def get_current_frame_embeddings(self):
        frame = (
            self.render_input_interp_0 * (1 - self.interpolation_coef)
            + self.render_input_interp_1 * self.interpolation_coef
        )
        if self.sweeping_hdri and self.hdri_turntable_embeddings is not None:
            hdri_params = self.hdri_turntable_embeddings[self.current_hdri_embedding_frame]
            frame = self.confignet_model.set_facemodel_param_in_latents(
                frame, "hdri_embedding", hdri_params
            )
            self.current_hdri_embedding_frame = (
                self.current_hdri_embedding_frame + 1
            ) % len(self.hdri_turntable_embeddings)
        return frame

    # ------------------------------------------------------------------

    @staticmethod
    def print_instructions() -> None:
        print("Esc - exits the app")
        print("W,S,A,D - control the head pose")
        print("I,K,J,L - control the gaze direction")
        print("N - toggle the pre-set illumination (HDRI) rotation sequence")
        print("Z, C - change the currently driven face model parameter (attribute)")

    def drive_ui(self, key: int, test_mode: bool = False) -> int:
        if ord("A") <= key < ord("Z"):
            key += ord("a") - ord("A")
        if key == 27 or test_mode:
            self.exit = True

        step = self.rotation_angle_step_size
        pose_keys = {"a": (0, -step), "d": (0, step), "w": (1, -step),
                     "s": (1, step), "q": (2, -step), "e": (2, step)}
        gaze_keys = {"j": (2, -step), "l": (2, step), "i": (0, -step),
                     "k": (0, step), "u": (1, -step), "o": (1, step)}

        for k, (axis, delta) in pose_keys.items():
            if key == ord(k) or test_mode:
                self.rotation_offset[0, axis] += delta
                print(self.rotation_offset * 180 / np.pi)
        for k, (axis, delta) in gaze_keys.items():
            if key == ord(k) or test_mode:
                self.eye_rotation_offset[0, axis] += delta
                print(self.eye_rotation_offset * 180 / np.pi)

        if key == ord("z") or test_mode:
            self.controlled_param_idx = (self.controlled_param_idx - 1) % len(
                self.facemodel_param_names
            )
            print("Currently controlled face model parameter:",
                  self.facemodel_param_names[self.controlled_param_idx])
        if key == ord("c") or test_mode:
            self.controlled_param_idx = (self.controlled_param_idx + 1) % len(
                self.facemodel_param_names
            )
            print("Currently controlled face model parameter:",
                  self.facemodel_param_names[self.controlled_param_idx])
        if key == ord("n") or test_mode:
            self.sweeping_hdri = not self.sweeping_hdri
            print("Light source rotation changed to " + str(self.sweeping_hdri))
        return key
