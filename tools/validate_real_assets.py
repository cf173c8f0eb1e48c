"""First-contact validation kit for real data and the real Inception pb.

This environment is zero-egress: the real
`inceptionv1_for_inception_score.pb` (reference eval_utils.py:41-49) and
real TFDS artifacts cannot be fetched, so their numerics are validated
structurally (synthetic fixtures, op-level TF oracles). The day the real
assets appear, this tool runs the whole first-contact checklist in one
command and writes a pass/fail report — turnkey validation instead of
archaeology:

  1. `--inception_pb`: convert the frozen graph to npz
     (`inception_net.convert_frozen_graph`) and assert the pure-JAX
     network reproduces the TF frozen-graph session's pool_3/logits on
     fixed inputs (the reference's exact execution path,
     eval_utils.py:165-206).
  2. `--dataset` (+ `--data_dir`): decode parity on the real shards —
     the framework's source reader (incl. the native C++ TFRecord
     framing) must reproduce an independent TF decode record-for-record;
     the train/eval streams must yield the declared shapes, [0,1] range
     and in-bounds labels.
  3. Golden FID: with an Inception source available, FID between two
     disjoint halves of the real eval split must be tiny against the
     FID between real images and uniform noise (the scale anchors every
     convergence proof uses).

Usage:
    python tools/validate_real_assets.py \
        --inception_pb /path/to/inceptionv1_for_inception_score.pb \
        --dataset cifar10 --data_dir /path/to/tensorflow_datasets \
        --workdir /tmp/validate --report /tmp/validate/report.json

Exit code 0 iff every requested check passes. The CI test
(tests/test_validate_real_assets.py) runs this kit against the synthetic
fixtures so the kit itself cannot rot.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def check_inception(pb_path, workdir, report):
    """pb -> npz conversion + JAX-vs-TF feature parity on fixed inputs."""
    from compare_gan_tpu import eval_utils
    from compare_gan_tpu.metrics import inception_net

    npz = os.path.join(workdir, "inception_from_pb.npz")
    inception_net.convert_frozen_graph(pb_path, npz)
    imgs = (np.random.RandomState(0).rand(8, 64, 64, 3) * 255).astype(
        np.float32)
    pj, lj = eval_utils._jax_inception_fn(npz)(imgs)
    pt, lt = eval_utils._tf_frozen_graph_fn(pb_path)(imgs)
    pool_diff = float(np.max(np.abs(pj - pt)))
    logits_diff = float(np.max(np.abs(lj - lt)))
    scale = float(np.max(np.abs(pt)) + 1e-12)
    ok = (pj.shape == pt.shape and np.isfinite(pj).all()
          and np.allclose(pj, pt, rtol=1e-3, atol=5e-3)
          and np.allclose(lj, lt, rtol=1e-3, atol=5e-3))
    report["inception"] = {
        "ok": bool(ok), "npz": npz, "pool_shape": list(pj.shape),
        "max_abs_pool_diff": pool_diff,
        "max_abs_logits_diff": logits_diff, "pool_scale": scale}
    return ok, npz


def check_dataset(name, num_examples, report):
    """Source-decode parity vs an independent TF decode + stream checks."""
    import tensorflow as tf

    from compare_gan_tpu import datasets

    ds = datasets.get_dataset(name)
    src = ds._get_source()
    detail = {"num_train": int(src.num_examples("train"))}
    ok = detail["num_train"] > 0

    # Record-for-record decode parity. For TFRecord sources this drives
    # the native C++ framing/index against tf.io's parser on the REAL
    # shards; npz sources compare the uint8->f32 scaling.
    n = min(num_examples, detail["num_train"])
    max_diff = 0.0
    for i in range(n):
        image, label, _ = src.get("train", i, seed=0)
        if isinstance(src, datasets.TFRecordSource):
            path, pos = src._index["train"][i]
            payload = next(datasets._py_iter_tfrecords(path, start=pos))[1]
            ex = tf.train.Example.FromString(payload)
            feats = ex.features.feature
            for key in ("image", "image/encoded"):
                if key in feats and feats[key].bytes_list.value:
                    encoded = feats[key].bytes_list.value[0]
                    break
            else:
                # No image bytes under either key: report a clean failure
                # for THIS record instead of crashing (first record) or
                # silently re-comparing the previous record's payload
                # (round-4 advisor).
                detail.setdefault("records_missing_image_key", []).append(i)
                ok = False
                continue
            want = tf.io.decode_image(encoded).numpy()
            if want.ndim == 2:
                want = want[:, :, None]
            want = want.astype(np.float32) / 255.0
            want_label = 0
            for key in ("label", "image/class/label"):
                if key in feats and feats[key].int64_list.value:
                    want_label = int(feats[key].int64_list.value[0])
                    break
            max_diff = max(max_diff,
                           float(np.max(np.abs(image - want))))
            ok &= image.shape == want.shape and label == want_label
    detail["decode_records_checked"] = n
    detail["max_abs_decode_diff"] = max_diff
    ok &= max_diff < 1e-6

    # Transformed streams: declared shape, range, label bounds.
    for split_desc, it in [
            ("train", ds._iter_examples(
                "train", shuffle=True, repeat=True,
                transform=ds._train_transform, seed=ds._seed,
                shard_by_host=False)),
            ("eval", ds._iter_examples(
                ds._resolve_eval_split(ds._eval_split),
                shuffle=False, repeat=False,
                transform=ds._eval_transform, seed=ds._seed,
                shard_by_host=False))]:
        shapes_ok = range_ok = labels_ok = True
        count = 0
        for image, label in it:
            shapes_ok &= tuple(image.shape) == tuple(ds.image_shape)
            range_ok &= (np.min(image) >= 0.0 and np.max(image) <= 1.0
                         and np.isfinite(image).all())
            if ds.num_classes:
                lab = int(np.argmax(label)) if np.ndim(label) else int(label)
                labels_ok &= 0 <= lab < ds.num_classes
            count += 1
            if count >= num_examples:
                break
        detail[split_desc] = {"checked": count, "shapes_ok": bool(shapes_ok),
                              "range_ok": bool(range_ok),
                              "labels_ok": bool(labels_ok)}
        ok &= shapes_ok and range_ok and labels_ok and count > 0
    report["dataset"] = {"ok": bool(ok), "name": name, **detail}
    return ok, ds


def check_golden_fid(ds, num_per_half, report):
    """FID(real_A, real_B) must be tiny against FID(noise, real_B)."""
    from compare_gan_tpu import eval_utils
    from compare_gan_tpu.metrics import fid_score

    split = ds._resolve_eval_split(ds._eval_split)
    # load_eval_images is the production real-stats path: [0, 255] range,
    # 1->3 channel tiling, deterministic order.
    imgs = ds.load_eval_images(2 * num_per_half,
                               failure_on_insufficient_examples=False)
    num_per_half = min(num_per_half, len(imgs) // 2)
    imgs = np.asarray(imgs, np.float32)
    half_a, half_b = imgs[:num_per_half], imgs[num_per_half:]
    noise = (np.random.RandomState(1)
             .rand(*half_b.shape).astype(np.float32) * 255.0)

    feats = lambda x: eval_utils.inception_transform_np(x)[0]  # noqa: E731
    fid_rr = float(fid_score.compute_fid_from_activations(
        feats(half_a), feats(half_b)))
    fid_rn = float(fid_score.compute_fid_from_activations(
        feats(noise), feats(half_b)))
    ok = (np.isfinite(fid_rr) and np.isfinite(fid_rn)
          and fid_rr < 0.25 * fid_rn)
    report["golden_fid"] = {
        "ok": bool(ok), "split": split, "num_per_half": len(half_a),
        "fid_real_real": fid_rr, "fid_real_noise": fid_rn}
    return ok


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--inception_pb", help="Real frozen Inception graph.")
    p.add_argument("--dataset", help="Registered dataset name to validate.")
    p.add_argument("--data_dir", help="Real data root "
                   "(default: $COMPARE_GAN_DATA_DIR).")
    p.add_argument("--workdir", default="/tmp/validate_real_assets")
    p.add_argument("--report", default=None,
                   help="Report JSON path (default: <workdir>/report.json).")
    p.add_argument("--num_examples", type=int, default=64,
                   help="Records per decode/stream check.")
    p.add_argument("--fid_samples", type=int, default=1024,
                   help="Images per half in the golden-FID check.")
    args = p.parse_args(argv)
    if not args.inception_pb and not args.dataset:
        p.error("Nothing to validate: pass --inception_pb and/or --dataset.")
    os.makedirs(args.workdir, exist_ok=True)
    if args.data_dir:
        os.environ["COMPARE_GAN_DATA_DIR"] = args.data_dir
        from compare_gan_tpu import datasets
        datasets.DATA_DIR = args.data_dir

    report = {}
    all_ok = True
    if args.inception_pb:
        ok, npz = check_inception(args.inception_pb, args.workdir, report)
        all_ok &= ok
        # The converted npz becomes the Inception source for the FID
        # check (and is the artifact users point
        # $COMPARE_GAN_INCEPTION_NPZ at afterwards).
        os.environ["COMPARE_GAN_INCEPTION_NPZ"] = npz
        from compare_gan_tpu import eval_utils
        eval_utils.set_inception_fn(None)

    if args.dataset:
        ok, ds = check_dataset(args.dataset, args.num_examples, report)
        all_ok &= ok
        has_inception = (os.environ.get("COMPARE_GAN_INCEPTION_NPZ")
                         or os.environ.get("COMPARE_GAN_INCEPTION_PB"))
        if ok and has_inception:
            all_ok &= check_golden_fid(ds, args.fid_samples, report)
        elif not has_inception:
            report["golden_fid"] = {
                "ok": None,
                "skipped": "no Inception source (set --inception_pb or "
                           "$COMPARE_GAN_INCEPTION_NPZ/_PB)"}

    report["all_ok"] = bool(all_ok)
    report_path = args.report or os.path.join(args.workdir, "report.json")
    with open(report_path, "w") as f:
        json.dump(report, f, indent=2)
    for name, res in report.items():
        if isinstance(res, dict):
            status = {True: "PASS", False: "FAIL", None: "SKIP"}[res["ok"]]
            print(f"{status} {name}: "
                  f"{json.dumps({k: v for k, v in res.items() if k != 'ok'})}")
    print(("OK" if all_ok else "FAILED") + f" — report: {report_path}")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
