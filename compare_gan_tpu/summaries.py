"""Training summaries, host-side.

Rebuild of compare_gan/tpu/tpu_summaries.py (113 LoC). The reference
streams tensors off-device per step via TPUEstimatorSpec.host_call and
writes TF summaries every 250 steps on host 0. Here the jitted train loop
returns a small metrics pytree per chunk (one device→host transfer per
`steps_per_loop`, strictly less traffic than the reference's per-step
outfeed) and this module writes TensorBoard event files — via
tf.summary when TensorFlow is importable, else a JSONL fallback with the
same keys so observability never silently disappears.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np

from compare_gan_tpu import utils


class SummaryWriter:
    """Scalar + image-grid summaries (TpuSummaries surface,
    tpu_summaries.py:57-113; save_summary_steps=250 default)."""

    def __init__(self, model_dir: str, save_summary_steps: int = 250):
        self._model_dir = model_dir
        self._every = save_summary_steps
        self._next_due = save_summary_steps
        self._tf_writer = None
        self._jsonl: Optional[object] = None
        os.makedirs(model_dir, exist_ok=True)
        try:
            import tensorflow as tf  # Host-only dependency.
            self._tf = tf
            self._tf_writer = tf.summary.create_file_writer(model_dir)
        except Exception:
            self._tf = None
            self._jsonl = open(
                os.path.join(model_dir, "summaries.jsonl"), "a")

    def should_write(self, step: int) -> bool:
        """Pure predicate: is an image/extra summary due at `step`?

        Due-step trigger, not `% == 0`: the trainer asks only at scan
        chunk boundaries, which need not hit exact multiples of the
        cadence (default iterations_per_loop=100 vs cadence 250 would
        otherwise fire at half rate, non-divisors never). Callers act on
        it and then call mark_written(step) — split so repeated probes
        for the same step agree (mirrors hooks.EveryNSteps'
        should_trigger/mark_triggered pair)."""
        return step >= self._next_due

    def mark_written(self, step: int) -> None:
        if step >= self._next_due:
            self._next_due = (step // self._every + 1) * self._every

    def scalar(self, tag: str, value, step: int) -> None:
        value = float(np.asarray(value))
        if self._tf_writer is not None:
            with self._tf_writer.as_default():
                self._tf.summary.scalar(tag, value, step=step)
        else:
            self._jsonl.write(json.dumps(
                {"step": step, "tag": tag, "value": value,
                 "time": time.time()}) + "\n")

    def scalars(self, metrics: dict, step: int) -> None:
        for tag, value in metrics.items():
            self.scalar(tag, value, step)

    def image_grid(self, tag: str, images, step: int, grid_shape=(8, 8)
                   ) -> None:
        """8x8 sample grid (modular_gan.py:308-343). `images` [N,H,W,C] in
        [0,1]; only the first gh*gw are used."""
        images = np.asarray(images)
        cells = grid_shape[0] * grid_shape[1]
        n = min(len(images), cells)
        # Honor the requested shape whenever it is filled; auto-square
        # only for partial grids.
        grid = utils.image_grid(images[:n],
                                grid_shape=None if n < cells else grid_shape)
        if self._tf_writer is not None:
            with self._tf_writer.as_default():
                self._tf.summary.image(
                    tag, grid[None].astype(np.float32), step=step)
        # JSONL fallback records only that an image was emitted.
        elif self._jsonl is not None:
            self._jsonl.write(json.dumps(
                {"step": step, "tag": tag, "image_shape": list(grid.shape)})
                + "\n")

    def flush(self) -> None:
        if self._tf_writer is not None:
            self._tf_writer.flush()
        if self._jsonl is not None:
            self._jsonl.flush()

    def close(self) -> None:
        self.flush()
        if self._jsonl is not None:
            self._jsonl.close()
