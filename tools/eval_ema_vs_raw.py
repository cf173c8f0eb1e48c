"""Per-checkpoint EMA-vs-raw generator FID diagnosis.

Evaluates every checkpoint of a trained run TWICE — once with the EMA
generator shadows (the production eval path, reference
eval_gan_lib.py:145-156) and once with the RAW (non-averaged) generator
params — and writes both trajectories to one CSV. Separating the two
answers the first question of any late-training metric degradation:
does the underlying G get worse (recipe-level GAN dynamics — raw FID
degrades, EMA follows with a lag), or does only the EMA copy degrade
while raw stays put (which would point at the EMA/state machinery
instead)?

Usage (same env as the training run):
  COMPARE_GAN_DATA_DIR=... COMPARE_GAN_INCEPTION_NPZ=... \
    python tools/eval_ema_vs_raw.py --model_dir=/tmp/s3gan32 \
      --gin_config=example_configs/s3gan32_polygons_partial.gin \
      --out=/tmp/s3gan32/ema_vs_raw.csv
"""

from __future__ import annotations

import argparse
import copy
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from absl import logging  # noqa: E402


def evaluate_model_dir(gan, model_dir, batch_size=64, out_path=None,
                       num_accu_examples=204800):
    """FID of every checkpoint in `model_dir` under both the EMA and the
    raw generator params. Returns the row list; rewrites `out_path`
    after every checkpoint so an interrupted sweep keeps its rows."""
    from compare_gan_tpu import checkpoint as ckpt_lib
    from compare_gan_tpu import eval_gan_lib
    from compare_gan_tpu.metrics import fid_score

    if not gan._g_use_ema:
        raise ValueError("Run trained without g_use_ema; nothing to "
                         "compare.")
    # The raw-G view shares the jit cache (copy.copy aliases the
    # attribute values, including _eval_jit_cache): samplers/accu-fill
    # take params as jit ARGUMENTS, so one compiled fn serves both param
    # sets — only _inference_params' host-side selection differs. The
    # cache is created lazily, so force it into existence BEFORE the
    # copy — copying first would leave each view with its own dict and
    # every eval fn compiling twice (round-5 review).
    eval_gan_lib._jit_cache(gan)
    raw_gan = copy.copy(gan)
    raw_gan._g_use_ema = False
    assert raw_gan._eval_jit_cache is gan._eval_jit_cache

    task = fid_score.FIDScoreTask()
    rows = []
    for path in ckpt_lib.all_checkpoints(model_dir):
        step = ckpt_lib.step_of(path)
        if step == 0:
            continue
        row = {"step": step}
        for name, g in (("ema", gan), ("raw", raw_gan)):
            res = eval_gan_lib.evaluate_checkpoint(
                g, path, [task], batch_size=batch_size,
                num_averaging_runs=1,
                num_accu_examples=num_accu_examples,
                export_accu_checkpoint=False)
            row[f"fid_{name}"] = res["fid_score_mean"]
            logging.info("step %d %s fid=%.4f", step, name,
                         res["fid_score_mean"])
        rows.append(row)
        if out_path is not None:
            with open(out_path, "w", newline="") as f:
                w = csv.DictWriter(
                    f, fieldnames=["step", "fid_ema", "fid_raw"])
                w.writeheader()
                w.writerows(rows)
    return rows


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--gin_config", required=True, nargs="+")
    parser.add_argument("--gin_bindings", default=[], nargs="*")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--out", default=None,
                        help="CSV path (default <model_dir>/ema_vs_raw.csv)")
    args = parser.parse_args()
    logging.set_verbosity(logging.INFO)

    from compare_gan_tpu import config as gin
    from compare_gan_tpu import datasets
    from compare_gan_tpu import runner_lib
    from compare_gan_tpu.utils import misc

    misc.enable_persistent_compile_cache()
    gin.parse_config_files_and_bindings(args.gin_config, args.gin_bindings)
    options = runner_lib.get_options_dict()
    dataset = datasets.get_dataset(seed=547)
    gan = options["gan_class"](dataset=dataset, parameters=options,
                               model_dir=args.model_dir)
    _, num_accu = runner_lib._resolved_eval_settings(eval_tasks=[])
    out_path = args.out or os.path.join(args.model_dir, "ema_vs_raw.csv")
    rows = evaluate_model_dir(gan, args.model_dir,
                              batch_size=args.batch_size,
                              out_path=out_path,
                              num_accu_examples=num_accu)
    print(f"wrote {out_path} ({len(rows)} checkpoints)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
