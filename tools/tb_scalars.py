"""Dump scalar training summaries from a model_dir to CSV.

Reads every `events.out.tfevents.*` file the runner's SummaryWriter
wrote (TB v2 summaries; summaries.py) — or the JSONL fallback when the
run had no TensorFlow — and writes one `<out_dir>/<tag>.csv` per
requested tag with `step,value` rows, sorted by step. This is how the
convergence-proof loss traces in docs/convergence_*/ are extracted.

Usage:
  python tools/tb_scalars.py --model_dir=/tmp/s3gan32 --out_dir=docs/x \
      --tags loss/d_loss loss/g_loss loss/class_loss_real
  (omit --tags to dump every scalar tag found)
"""

from __future__ import annotations

import argparse
import collections
import csv
import glob
import json
import os
import sys


def read_scalars(model_dir):
    """{tag: [(step, value), ...]} from TB event files and/or the JSONL
    fallback, steps sorted, later duplicates (restarts) winning."""
    series = collections.defaultdict(dict)
    # JSONL fallback rows first, TB event rows second: a run that
    # restarted in a TF-capable environment re-emits its scalars into
    # event files, and those must win over the pre-restart fallback rows
    # for the same (tag, step) — reading JSONL last would resurrect the
    # stale values (round-5 review).
    for path in sorted(glob.glob(os.path.join(model_dir,
                                              "summaries*.jsonl"))):
        with open(path) as f:
            for line in f:
                row = json.loads(line)
                if "value" in row:
                    series[row["tag"]][row["step"]] = row["value"]
    event_files = sorted(glob.glob(
        os.path.join(model_dir, "events.out.tfevents.*")))
    if event_files:
        import tensorflow as tf  # noqa: local import, TF optional
        from tensorflow.core.util import event_pb2
        for path in event_files:
            for rec in tf.data.TFRecordDataset(path):
                ev = event_pb2.Event.FromString(rec.numpy())
                for v in ev.summary.value:
                    # TB v2 scalars arrive as rank-0 tensors.
                    if v.HasField("tensor"):
                        try:
                            val = float(tf.make_ndarray(v.tensor))
                        except (ValueError, TypeError):
                            continue
                        series[v.tag][ev.step] = val
                    elif v.HasField("simple_value"):
                        series[v.tag][ev.step] = float(v.simple_value)
    return {tag: sorted(by_step.items())
            for tag, by_step in series.items()}


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--tags", nargs="*", default=None,
                        help="Scalar tags to dump (default: all found)")
    args = parser.parse_args()

    series = read_scalars(args.model_dir)
    tags = args.tags if args.tags else sorted(series)
    os.makedirs(args.out_dir, exist_ok=True)
    missing = [t for t in tags if t not in series]
    if missing:
        print(f"WARNING: tags not found: {missing}; "
              f"available: {sorted(series)}", file=sys.stderr)
    for tag in tags:
        if tag not in series:
            continue
        out = os.path.join(args.out_dir,
                           tag.replace("/", "_") + ".csv")
        with open(out, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["step", tag.split("/")[-1]])
            w.writerows(series[tag])
        print(f"{out}: {len(series[tag])} points")
    return 0


if __name__ == "__main__":
    sys.exit(main())
