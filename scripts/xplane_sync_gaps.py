"""Sync-idle gap attribution: intervals where no SYNC op runs, charged to
the async (DMA) ops in flight that END inside or just after each gap.

Usage: python scripts/xplane_sync_gaps.py <xplane.pb> [n_runs] [min_gap_us]
"""
import re
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sys.argv[1]
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
min_gap_us = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0

ASYNC = ("copy-start", "slice-start", "async-start", "copy-done",
         "slice-done", "async-done", "all-reduce-start", "copy-start-done")

xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())
for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    ev_meta = plane.event_metadata
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        sync, asyn = [], []
        for ev in line.events:
            name = ev_meta[ev.metadata_id].name
            (asyn if any(a in name for a in ASYNC) else sync).append(
                (ev.offset_ps, ev.duration_ps, name))
        sync.sort()
        # merged sync-busy intervals -> gaps
        gaps = []
        cur_e = sync[0][0] + sync[0][1]
        for s, d, _ in sync[1:]:
            if s > cur_e and (s - cur_e) / 1e6 >= min_gap_us:
                gaps.append((cur_e, s))
            cur_e = max(cur_e, s + d)
        total_gap = sum(e - s for s, e in gaps) / 1e9
        print(f"sync-idle {total_gap/runs:.1f} ms/run over "
              f"{len(gaps)} gaps (>= {min_gap_us}us)")
        # async events sorted by END time; attribute each gap to async ops
        # ending within [gap_start, gap_end + 50us]
        ends = sorted((s + d, s, name) for s, d, name in asyn)
        by_waiter = defaultdict(float)
        cnt = defaultdict(int)
        samples = defaultdict(list)
        import bisect
        end_keys = [e for e, _, _ in ends]
        for gs, ge in gaps:
            lo = bisect.bisect_left(end_keys, gs)
            hi = bisect.bisect_right(end_keys, ge + 50_000_000)
            enders = ends[lo:hi]
            if not enders:
                by_waiter["(no async end near gap)"] += (ge - gs) / 1e9
                cnt["(no async end near gap)"] += 1
                continue
            share = (ge - gs) / 1e9 / len(enders)
            for _, _, name in enders:
                key = re.sub(r"\.\d+", "", name.split(" = ")[0])
                m = re.search(r"=\s*\(?([a-z0-9\[\],]+)", name)
                shape = m.group(1)[:40] if m else ""
                key = f"{key} {shape}"
                by_waiter[key] += share
                cnt[key] += 1
                if len(samples[key]) < 1:
                    samples[key].append(name[:150])
        print("-- sync-idle charged to async ops ending at the gap:")
        for k, d in sorted(by_waiter.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {d/runs:8.2f} ms  x{cnt[k]//max(runs,1):<5} {k}")
            for s in samples.get(k, []):
                print(f"             e.g. {s}")
        print("-- 20 largest sync-idle gaps:")
        for gs, ge in sorted(gaps, key=lambda p: p[0] - p[1])[:20]:
            lo = bisect.bisect_left(end_keys, gs)
            hi = bisect.bisect_right(end_keys, ge + 50_000_000)
            names = [re.sub(r"\.\d+", "", n.split(" = ")[0])
                     for _, _, n in ends[lo:hi]][:4]
            print(f"  {(ge-gs)/1e9:8.3f} ms  enders: {names}")
