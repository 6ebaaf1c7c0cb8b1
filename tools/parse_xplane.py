#!/usr/bin/env python3
"""Standalone xplane.pb parser: aggregate TPU op self-times by name.

The installed tensorboard_plugin_profile's native converter is incompatible
with this TF build, so this reads the raw XSpace proto directly
(run with PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python).

Usage: python tools/parse_xplane.py <trace_dir_or_xplane.pb> [topk]
"""
from __future__ import annotations

import collections
import glob
import os
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main():
    path = sys.argv[1]
    topk = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    if os.path.isdir(path):
        files = glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True)
        path = sorted(files)[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for p in xs.planes:
        if not p.name.startswith("/device:TPU"):
            continue
        md = {k: v.name for k, v in p.event_metadata.items()}
        agg = collections.defaultdict(lambda: [0.0, 0])
        line_total = collections.defaultdict(float)
        for line in p.lines:
            for ev in line.events:
                dur_us = ev.duration_ps / 1e6
                name = md.get(ev.metadata_id, str(ev.metadata_id))
                line_total[line.name] += dur_us
                if "XLA Ops" in line.name or "XLA TPU Ops" in line.name:
                    a = agg[name]
                    a[0] += dur_us
                    a[1] += 1
        print(f"== plane {p.name} ==")
        for ln, t in sorted(line_total.items(), key=lambda kv: -kv[1]):
            print(f"  line {ln:30s} total {t/1e3:10.2f} ms")
        if not agg:
            # fall back: aggregate the busiest line
            busiest = max(line_total, key=line_total.get)
            for line in p.lines:
                if line.name != busiest:
                    continue
                for ev in line.events:
                    name = md.get(ev.metadata_id, str(ev.metadata_id))
                    a = agg[name]
                    a[0] += ev.duration_ps / 1e6
                    a[1] += 1
        print(f"== top {topk} ops ==")
        for name, (t, c) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:topk]:
            print(f"  {t:10.0f} us  x{c:<6d} {name[:120]}")


if __name__ == "__main__":
    main()
