"""Attribute device-idle gaps in an xplane trace to the ops that end them.

For the 'XLA Ops' line: merge busy intervals, find idle gaps above a
threshold, and charge each gap to the op that starts right after it (the op
the device was stalled waiting for — usually a copy-done or the consumer of
an in-flight DMA). Prints the top gap-enders by total charged idle time.

Usage: python scripts/xplane_gaps.py <xplane.pb> [n_runs] [min_gap_us]
"""
import re
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sys.argv[1]
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
min_gap_us = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0

xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())
for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    ev_meta = plane.event_metadata
    for line in plane.lines:
        if "XLA Ops" not in line.name:
            continue
        evs = sorted(
            (ev.offset_ps, ev.duration_ps, ev_meta[ev.metadata_id].name)
            for ev in line.events
        )
        if not evs:
            continue
        # merged busy intervals, remembering the first op that starts each
        # new interval (the gap-ender)
        gaps = []  # (gap_ps, ender_name)
        cur_e = evs[0][0] + evs[0][1]
        for s, d, name in evs[1:]:
            if s > cur_e:
                gaps.append((s - cur_e, name))
            cur_e = max(cur_e, s + d)
        span = (evs[-1][0] + evs[-1][1] - evs[0][0]) / 1e9
        total_gap = sum(g for g, _ in gaps) / 1e9
        print(f"span {span/runs:.1f} ms/run, idle {total_gap/runs:.1f} "
              f"ms/run over {len(gaps)} gaps")
        by_ender = defaultdict(float)
        cnt = defaultdict(int)
        big = []
        for g, name in gaps:
            if g / 1e6 < min_gap_us:  # ps -> us
                key = "(gaps < %.0fus)" % min_gap_us
                by_ender[key] += g / 1e9
                cnt[key] += 1
                continue
            key = re.sub(r"\.\d+", "", name.split(" = ")[0])
            by_ender[key] += g / 1e9
            cnt[key] += 1
            big.append((g, name))
        print("-- idle time charged to the op ending each gap:")
        for k, d in sorted(by_ender.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {d/runs:8.2f} ms  x{cnt[k]//max(runs,1):<5} {k[:100]}")
        print("-- 15 largest individual gaps:")
        for g, name in sorted(big, reverse=True)[:15]:
            print(f"  {g/1e9:8.3f} ms  {name[:140]}")
