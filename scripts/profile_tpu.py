#!/usr/bin/env python
"""Profile the DIS pipeline on the real TPU and print a per-op time table.

No xplane proto ships in this image and tensorboard_plugin_profile's
converter is broken (protobuf version mismatch), so this script carries a
hand-written XSpace/XPlane proto, compiles it with protoc at runtime, and
parses the trace directly (see CLAUDE.md "Profiling").

Usage:
    python scripts/profile_tpu.py [--op 2] [--batch 16] [--mode flow]
                                  [--top 40] [--stage search|refine|all]

Prints total device time per XLA op (plane "/device:TPU:0", line "XLA Ops"),
aggregated by op-metadata name, descending.
"""

import argparse
import glob
import os
import subprocess
import sys
import tempfile

import numpy as np

XPLANE_PROTO = r"""
syntax = "proto3";
package tensorflow.profiler;

message XSpace {
  repeated XPlane planes = 1;
  repeated string errors = 2;
  repeated string warnings = 3;
  repeated string hostnames = 4;
}

message XPlane {
  int64 id = 1;
  string name = 2;
  repeated XLine lines = 3;
  map<int64, XEventMetadata> event_metadata = 4;
  map<int64, XStatMetadata> stat_metadata = 5;
  repeated XStat stats = 6;
}

message XLine {
  int64 id = 1;
  string name = 2;
  int64 timestamp_ns = 3;
  repeated XEvent events = 4;
  int64 duration_ps = 9;
  int64 display_id = 10;
  string display_name = 11;
}

message XEvent {
  int64 metadata_id = 1;
  oneof data {
    int64 offset_ps = 2;
    int64 num_occurrences = 5;
  }
  int64 duration_ps = 3;
  repeated XStat stats = 4;
}

message XStat {
  int64 metadata_id = 1;
  oneof value {
    double double_value = 2;
    uint64 uint64_value = 3;
    int64 int64_value = 4;
    string str_value = 5;
    bytes bytes_value = 6;
    uint64 ref_value = 7;
  }
}

message XEventMetadata {
  int64 id = 1;
  string name = 2;
  bytes metadata = 3;
  string display_name = 4;
  repeated XStat stats = 5;
  repeated int64 child_id = 6;
}

message XStatMetadata {
  int64 id = 1;
  string name = 2;
  string description = 3;
}
"""


def load_xplane_module():
    """Compile the xplane proto with protoc and import the generated module."""
    d = tempfile.mkdtemp(prefix="xplane_proto_")
    src = os.path.join(d, "xplane.proto")
    with open(src, "w") as f:
        f.write(XPLANE_PROTO)
    subprocess.run(["protoc", f"--proto_path={d}", f"--python_out={d}", src], check=True)
    sys.path.insert(0, d)
    import xplane_pb2  # noqa

    return xplane_pb2


def parse_trace(trace_dir, plane_substr="TPU", line_name="XLA Ops"):
    """-> dict op_name -> (total_ps, count) from the newest xplane.pb."""
    pbs = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")))
    if not pbs:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    mod = load_xplane_module()
    space = mod.XSpace()
    with open(pbs[-1], "rb") as f:
        space.ParseFromString(f.read())
    out = {}
    for plane in space.planes:
        if plane_substr not in plane.name:
            continue
        for line in plane.lines:
            if line_name and line.name != line_name:
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                t, c = out.get(name, (0, 0))
                out[name] = (t + ev.duration_ps, c + 1)
    return out


def parse_trace_busy(trace_dir, plane_substr="TPU", line_name="XLA Ops"):
    """-> union busy picoseconds: merged event intervals per line.

    Robust to NESTED events: a `while` op's trace duration includes its
    body fusions, which are ALSO emitted as events — summing durations
    double-counts loop bodies (op3's summed 'device time' exceeded wall by
    25%).  The union is the honest device-busy number."""
    pbs = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")))
    if not pbs:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    mod = load_xplane_module()
    space = mod.XSpace()
    with open(pbs[-1], "rb") as f:
        space.ParseFromString(f.read())
    total = 0
    for plane in space.planes:
        if plane_substr not in plane.name:
            continue
        for line in plane.lines:
            if line_name and line.name != line_name:
                continue
            iv = sorted(
                (ev.offset_ps, ev.offset_ps + ev.duration_ps)
                for ev in line.events
            )
            cur_s = cur_e = None
            for s, e in iv:
                if cur_e is None or s > cur_e:
                    if cur_e is not None:
                        total += cur_e - cur_s
                    cur_s, cur_e = s, e
                else:
                    cur_e = max(cur_e, e)
            if cur_e is not None:
                total += cur_e - cur_s
    return total


def classify(name: str) -> str:
    """Rough bucket for an XLA op name."""
    n = name.lower()
    for key, tag in (
        ("custom-call", "pallas/custom"),
        ("fusion", "fusion"),
        ("copy", "copy"),
        ("convolution", "conv"),
        ("dot", "dot"),
        ("dynamic-slice", "slice"),
        ("dynamic-update-slice", "dus"),
        ("gather", "gather"),
        ("scatter", "scatter"),
        ("reduce", "reduce"),
        ("transpose", "transpose"),
        ("bitcast", "bitcast"),
        ("all-reduce", "collective"),
        ("while", "while"),
    ):
        if key in n:
            return tag
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", type=int, default=2)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--mode", default="flow", choices=["flow", "stereo"])
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--calls", type=int, default=3)
    ap.add_argument("--trace-dir", default="/tmp/ofdis_trace")
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import jax
    import jax.numpy as jnp

    from of_dis_tpu import operating_point
    from of_dis_tpu.parallel.batch import _batched_padded

    H, W = 436, 1024
    cfg = operating_point(args.op, W, mode=args.mode)
    scf = 1 << cfg.sc_f
    Hp = H + (-H) % scf
    rng = np.random.RandomState(0)
    a = jax.device_put(jnp.asarray(rng.rand(args.batch, Hp, W, 1).astype(np.float32) * 255))
    b = jax.device_put(jnp.asarray(rng.rand(args.batch, Hp, W, 1).astype(np.float32) * 255))

    np.asarray(_batched_padded(a, b, cfg))  # compile
    import shutil

    shutil.rmtree(args.trace_dir, ignore_errors=True)
    with jax.profiler.trace(args.trace_dir):
        last = None
        for _ in range(args.calls):
            last = _batched_padded(a, b, cfg)
        np.asarray(last)

    ops = parse_trace(args.trace_dir)
    total_ps = sum(t for t, _ in ops.values())
    busy_ps = parse_trace_busy(args.trace_dir)
    print(f"# op{args.op} {args.mode} B={args.batch}: device busy (union) "
          f"{busy_ps/1e9/args.calls:.3f} ms/call; per-op sum "
          f"{total_ps/1e9/args.calls:.3f} ms/call (while rows INCLUDE their "
          f"bodies) over {args.calls} calls")
    print(f"{'us/call':>10} {'%':>5} {'count':>6}  {'bucket':<12} name")
    rows = sorted(ops.items(), key=lambda kv: -kv[1][0])
    for name, (t, c) in rows[: args.top]:
        print(f"{t/1e6/args.calls:10.1f} {100*t/total_ps:5.1f} {c:6d}  "
              f"{classify(name):<12} {name[:90]}")
    # bucket rollup
    buckets = {}
    for name, (t, c) in ops.items():
        k = classify(name)
        buckets[k] = buckets.get(k, 0) + t
    print("\n# bucket rollup")
    for k, t in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"{t/1e6/args.calls:10.1f} us/call {100*t/total_ps:5.1f}%  {k}")


if __name__ == "__main__":
    main()
