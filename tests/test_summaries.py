"""SummaryWriter behavior: cadence, scalars, image grids, JSONL fallback
(reference TpuSummaries surface, tpu_summaries.py:57-113)."""

import json
import os

import numpy as np

from compare_gan_tpu import summaries as summaries_lib


def test_cadence(tmp_path):
    """Due-step trigger: fires at the first step past each multiple of
    the cadence (the trainer only asks at chunk boundaries — with
    iterations_per_loop=100, cadence 250 must fire at 300, 500, 800, ...
    not only at exact multiples)."""
    w = summaries_lib.SummaryWriter(str(tmp_path), save_summary_steps=250)
    fired = []
    for s in range(100, 1001, 100):
        if w.should_write(s):
            fired.append(s)
            w.mark_written(s)
    assert fired == [300, 500, 800, 1000]
    w.close()

    w2 = summaries_lib.SummaryWriter(str(tmp_path), save_summary_steps=250)
    assert not w2.should_write(100)
    # should_write is a pure predicate: probing repeatedly for the same
    # step must keep answering True until mark_written is called
    # (round-2 advisor: the old query mutated state, so a second probe
    # silently returned False).
    assert w2.should_write(250)
    assert w2.should_write(250)
    w2.mark_written(250)
    assert not w2.should_write(250)
    assert w2.should_write(500)
    w2.close()


def test_scalars_and_images_tf_backend(tmp_path):
    w = summaries_lib.SummaryWriter(str(tmp_path), save_summary_steps=1)
    w.scalars({"loss/g": 1.25, "loss/d_0": np.float32(0.5)}, step=10)
    w.image_grid("fake_images", np.random.rand(4, 8, 8, 3), step=10)
    w.close()
    events = [f for f in os.listdir(tmp_path) if "tfevents" in f]
    assert events, os.listdir(tmp_path)


def test_jsonl_fallback(tmp_path, monkeypatch):
    """Without TF the writer degrades to JSONL with the same keys."""
    w = summaries_lib.SummaryWriter.__new__(summaries_lib.SummaryWriter)
    w._model_dir = str(tmp_path)
    w._every = 1
    w._tf = None
    w._tf_writer = None
    w._jsonl = open(os.path.join(str(tmp_path), "summaries.jsonl"), "a")
    w.scalar("loss/g", 2.5, step=3)
    w.image_grid("fake_images", np.random.rand(2, 4, 4, 1), step=3)
    w.close()
    rows = [json.loads(line)
            for line in open(os.path.join(str(tmp_path),
                                          "summaries.jsonl"))]
    assert rows[0] == {k: rows[0][k] for k in rows[0]}
    assert rows[0]["tag"] == "loss/g" and rows[0]["value"] == 2.5
    assert rows[1]["tag"] == "fake_images"


def test_tb_scalars_roundtrip(tmp_path):
    """tools/tb_scalars.py reads back what SummaryWriter wrote — both
    the TF-events backend and the JSONL fallback — with restart
    semantics (later write for the same step wins)."""
    from tools import tb_scalars
    w = summaries_lib.SummaryWriter(str(tmp_path), save_summary_steps=1)
    w.scalars({"loss/d_loss": 0.75, "loss/g_loss": 1.5}, step=250)
    w.scalars({"loss/d_loss": 0.5}, step=500)
    w.close()
    # A restarted run re-emits step 500 with a different value.
    w2 = summaries_lib.SummaryWriter(str(tmp_path), save_summary_steps=1)
    w2.scalar("loss/d_loss", 0.25, step=500)
    w2.close()
    series = tb_scalars.read_scalars(str(tmp_path))
    assert series["loss/d_loss"] == [(250, 0.75), (500, 0.25)]
    assert series["loss/g_loss"] == [(250, 1.5)]

    # JSONL fallback rows merge into the same series.
    with open(os.path.join(tmp_path, "summaries.jsonl"), "w") as f:
        f.write(json.dumps({"step": 750, "tag": "loss/g_loss",
                            "value": 0.1, "time": 0.0}) + "\n")
    series = tb_scalars.read_scalars(str(tmp_path))
    assert series["loss/g_loss"] == [(250, 1.5), (750, 0.1)]
