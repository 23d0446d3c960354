"""Parse a jax.profiler .xplane.pb: per-line busy occupancy + top sync ops +
category buckets.

Usage: python scripts/parse_xplane.py <xplane.pb> [n_runs]
"""
import re
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sys.argv[1]
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1

ASYNC = ("copy-start", "slice-start", "async-start", "copy-done",
         "slice-done", "async-done", "all-reduce-start")


def category(name: str) -> str:
    m = re.match(r"%([a-zA-Z_\-]+)", name)
    base = m.group(1) if m else name[:20]
    if "custom-call" in name:
        if "21504" in name:
            return "pallas:msda-extractor"
        if "16,32,4096" in name:
            return "pallas:msda-injector"
        if "4096,64" in name:
            return "pallas:flash-global"
        if "196" in name or "400" in name:
            return "pallas:win-attn"
        return "pallas:other"
    if "convolution" in name:
        return "convolution"
    if base.startswith(("dot", "fusion")) and "dot" in name:
        return "dot/fused-matmul"
    return base


xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())
for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    ev_meta = plane.event_metadata
    for line in plane.lines:
        evs = [(ev.offset_ps, ev.duration_ps, ev_meta[ev.metadata_id].name)
               for ev in line.events]
        if not evs:
            continue
        evs.sort()
        span = (evs[-1][0] + evs[-1][1] - evs[0][0]) / 1e9
        # merged busy time
        busy = 0
        cur_s, cur_e = evs[0][0], evs[0][0] + evs[0][1]
        for s, d, _ in evs[1:]:
            if s > cur_e:
                busy += cur_e - cur_s
                cur_s, cur_e = s, s + d
            else:
                cur_e = max(cur_e, s + d)
        busy += cur_e - cur_s
        print(f"line '{line.name}': {len(evs)} events, span "
              f"{span/runs:.1f} ms/run, busy {busy/1e9/runs:.1f} ms/run")
        if "XLA Ops" not in line.name:
            continue
        cats = defaultdict(float)
        sync_ops = defaultdict(float)
        cnt = defaultdict(int)
        for _, d, name in evs:
            if any(a in name for a in ASYNC):
                cats["(async-overlapped)"] += d / 1e9
                continue
            c = category(name)
            cats[c] += d / 1e9
            key = name.split(" = ")[0]
            key = re.sub(r"\.\d+", "", key)
            sync_ops[key] += d / 1e9
            cnt[key] += 1
        print("  -- categories (sync ops only):")
        for c, d in sorted(cats.items(), key=lambda kv: -kv[1])[:18]:
            print(f"    {d/runs:8.2f} ms  {c}")
        print("  -- top sync op groups:")
        for k, d in sorted(sync_ops.items(), key=lambda kv: -kv[1])[:25]:
            print(f"    {d/runs:8.2f} ms  x{cnt[k]//runs:<5} {k[:90]}")
