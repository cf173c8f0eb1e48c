"""Capture an xprof trace of the BigGAN-128 train step and print op stats.

Usage (on the TPU): python tools/profile_step.py [trace_dir]
Prints the top-30 framework ops by self time, one JSON line each.
"""

import json
import os
import sys

import jax
import numpy as np

from compare_gan_tpu.utils import misc  # noqa: E402

misc.enable_persistent_compile_cache()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof_step"
    from __graft_entry__ import _make_biggan

    gan = _make_biggan(resolution=128, batch_size=16,
                       compute_dtype="bfloat16", joint_gen_for_disc=True,
                       fake_only_g_loss=True)
    ts = gan.init_state(jax.random.PRNGKey(0), 16)
    step = jax.jit(gan.make_train_step(16), donate_argnums=0)

    total = 16 * gan.num_sub_steps
    rng = np.random.RandomState(0)
    batch = jax.device_put({
        "images": rng.rand(total, 128, 128, 3).astype(np.float32),
        "labels": rng.randint(0, 1000, size=(total,)).astype(np.int32),
    })

    for _ in range(3):
        ts, metrics = step(ts, batch)
    print("warm", float(metrics["loss/g"]), flush=True)

    with jax.profiler.trace(trace_dir):
        for _ in range(6):
            ts, metrics = step(ts, batch)
        float(metrics["loss/g"])

    import glob
    from xprof.convert import raw_to_tool_data
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        paths, "framework_op_stats", {})
    import csv
    import io
    if isinstance(data, bytes):
        data = data.decode()
    # gviz-JSON DataTable (current xprof) or CSV (older versions).
    stripped = data.lstrip()
    if stripped.startswith(("[", "{")):
        obj = json.loads(stripped)
        table = obj[0] if isinstance(obj, list) else obj
        ids = [c["id"] for c in table["cols"]]
        rows = [{k: (c or {}).get("v") for k, c in zip(ids, r["c"])}
                for r in table.get("rows", [])]
    else:
        rows = list(csv.DictReader(io.StringIO(data)))
    rows = [r for r in rows if r.get("host_or_device") == "Device"]
    rows.sort(key=lambda r: -float(r.get("total_self_time") or
                                   r.get("total_self_time_us") or
                                   r.get("self_time_us") or 0))
    keys = None
    for r in rows[:40]:
        if keys is None:
            keys = [k for k in ("op_type", "type", "op_name", "operation",
                                "occurrences", "total_self_time",
                                "total_self_time_us", "self_time_us",
                                "avg_self_time", "avg_self_time_us",
                                "flop_rate", "measured_flop_rate",
                                "bound_by")
                    if k in r]
            print(json.dumps({"columns": list(r.keys())}), flush=True)
        print(json.dumps({k: r[k] for k in keys}), flush=True)


if __name__ == "__main__":
    main()
