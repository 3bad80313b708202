"""Training observability: loss-history tracking and the reference's logging
sinks (matplotlib loss grids, plaintext dumps, TensorBoard scalars/images).

Reference counterparts: confignet/confignet_utils.py:206-241 (loss dict
update + log_loss_vals), confignet/azure_ml_utils.py (AML sink — here an
optional generic callback).
"""
from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import numpy as np


def update_loss_dict(main_loss_dict: Dict[str, List[float]], new_losses: Dict[str, object]) -> None:
    """Append scalar values of ``new_losses`` to the running history."""
    for key, val in new_losses.items():
        val = float(val)
        main_loss_dict.setdefault(key, []).append(val)


class LossFlusher:
    """Buffers per-step device-side loss pytrees and fetches them in batches.

    A per-step ``jax.device_get`` serializes host and device (the reference's
    eager loop pays the same cost implicitly; over the axon TPU tunnel one
    round-trip alone is ~35-40 ms).  Instead the train loops append the
    device scalars here and flush on a cadence — dispatch stays async and
    the device->host sync amortizes over ``period`` steps.
    """

    def __init__(self, period: int = 50):
        self.period = max(1, int(period))
        self._pending: list = []

    def append(self, losses) -> bool:
        """Queue one step's device losses; True when a flush is due."""
        self._pending.append(losses)
        return len(self._pending) >= self.period

    def flush(self) -> list:
        """Fetch all pending losses in one transfer (oldest first)."""
        import jax

        if not self._pending:
            return []
        fetched = jax.device_get(self._pending)
        self._pending = []
        return fetched


class TensorBoardWriter:
    """Thin optional wrapper over tf.summary; silently no-ops when TF is
    unavailable."""

    def __init__(self, log_dir: str):
        self._writer = None
        try:
            import tensorflow as tf  # type: ignore

            self._writer = tf.summary.create_file_writer(log_dir)
            self._tf = tf
        except Exception:
            self._tf = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._writer is None:
            return
        with self._writer.as_default():
            self._tf.summary.scalar(tag, float(value), step=step)

    def image(self, tag: str, image_bgr_uint8: np.ndarray, step: int) -> None:
        if self._writer is None:
            return
        rgb = image_bgr_uint8[..., ::-1]
        with self._writer.as_default():
            self._tf.summary.image(tag, rgb[np.newaxis], step=step)


# Curves longer than this are strided down before plotting: keeps the
# per-checkpoint plotting cost O(1) in run length (a 100k-step run would
# otherwise redraw 100k-point lines x ~40 subplots every image checkpoint).
MAX_PLOT_POINTS = 1024


def agg_pyplot():
    """pyplot with the Agg backend pinned — the sanctioned way to get
    pyplot anywhere in this package.  Loss plots render on the async
    checkpoint worker thread; interactive backends (TkAgg/QtAgg) require
    the main thread and would crash there, so never import pyplot
    directly."""
    import matplotlib

    matplotlib.use("Agg", force=True)
    from matplotlib import pyplot as plt

    return plt


def _semilogy_downsampled(ax, y) -> None:
    """Semilog curve capped at MAX_PLOT_POINTS points (strided, always
    keeping the final value so the plot ends at the latest loss).  Minor
    log ticks are ~70% of the Agg render for a 25-subplot grid (measured:
    savefig 2.1s -> 0.7s); the curves don't need them."""
    y = np.asarray(y, dtype=np.float64)
    if y.size > MAX_PLOT_POINTS:
        stride = int(np.ceil(y.size / MAX_PLOT_POINTS))
        xs = np.arange(0, y.size, stride)
        ys = y[::stride]
        if xs[-1] != y.size - 1:
            xs = np.append(xs, y.size - 1)
            ys = np.append(ys, y[-1])
        ax.semilogy(xs, ys)
    else:
        ax.semilogy(y)
    ax.minorticks_off()


def draw_loss_grid(losses: List[List[float]], loss_names: List[str], pix_per_plot: int = 300):
    """Square grid of semilog loss curves (reference: confignet_utils.py:23-37).

    Perf notes (measured on the 1-core rig, round 4): ``plt.subplots`` with
    fixed spacing instead of per-axes ``plt.subplot`` + ``tight_layout``
    (tight_layout alone was ~40% of a 25-subplot figure), and long histories
    are downsampled to MAX_PLOT_POINTS per curve."""
    plt = agg_pyplot()

    n_losses = len(loss_names)
    square = int(np.ceil(np.sqrt(max(n_losses, 1))))
    dpi = 100
    pix = square * pix_per_plot
    fig, axes = plt.subplots(square, square,
                             figsize=(pix // dpi, pix // dpi), dpi=dpi)
    axes = np.atleast_1d(axes).ravel()
    for i in range(n_losses):
        _semilogy_downsampled(axes[i], losses[i])
        axes[i].set_title(loss_names[i])
    for ax in axes[n_losses:]:
        ax.set_axis_off()
    fig.subplots_adjust(hspace=0.55, wspace=0.35,
                        left=0.06, right=0.98, top=0.94, bottom=0.05)


def log_loss_vals(
    loss_dict: Dict[str, List[float]],
    output_dir: str,
    step_number: int,
    prefix: str,
    tb_writer: Optional[TensorBoardWriter] = None,
    extra_sink: Optional[Callable[[str, float], None]] = None,
    draw_plots: bool = True,
) -> None:
    """Write the loss history to PNG grids, a txt table, TensorBoard and an
    optional extra sink (the AML analog)."""
    os.makedirs(output_dir, exist_ok=True)
    loss_names = list(loss_dict.keys())
    loss_vals = list(loss_dict.values())
    if not loss_names:
        return
    most_recent = [v[-1] for v in loss_vals]

    if extra_sink is not None:
        for name, value in zip(loss_names, most_recent):
            extra_sink(prefix + name, value)
    elif draw_plots:
        plt = agg_pyplot()

        draw_loss_grid(loss_vals, loss_names)
        plt.savefig(os.path.join(output_dir, prefix + "losses.png"))
        plt.close()
        if "loss_sum" in loss_dict:
            _semilogy_downsampled(plt.gca(), loss_dict["loss_sum"])
            plt.savefig(os.path.join(output_dir, prefix + "loss_sum.png"))
            plt.close()

    if tb_writer is not None:
        tb_prefix = prefix[::-1].replace("_", "/", 1)[::-1]
        for name, value in zip(loss_names, most_recent):
            tb_writer.scalar(tb_prefix + name, value, step_number)

    table = np.stack([np.asarray(v, dtype=np.float64) for v in loss_vals], axis=1)
    header = "\t".join(loss_names)
    np.savetxt(os.path.join(output_dir, prefix + "losses.txt"), table, header=header)
