"""Offline re-parse of /tmp/jaxtrace_detail against /tmp/hlo_scan.txt.

Fixes the %-prefix mismatch of tpu_profile_detail.py and adds:
- plane/line selection: only the synchronous 'XLA Ops' line busy time
- top individual ops with shape + op_name source attribution
- copy/transpose/reshape breakdown grouped by (shape, op_name tail)
"""
import glob
import re
import sys
from collections import defaultdict

N_SCAN = 9

hlo_def = {}
pat = re.compile(r"^\s*(?:ROOT )?%?([\w.-]+) = (\S+)")
meta_pat = re.compile(r'op_name="([^"]+)"')
for ln in open("/tmp/hlo_scan.txt"):
    m = pat.match(ln)
    if m:
        om = meta_pat.search(ln)
        hlo_def[m.group(1)] = (m.group(2), om.group(1) if om else "")
print(f"hlo defs: {len(hlo_def)}")

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

paths = glob.glob("/tmp/jaxtrace_detail/**/*.xplane.pb", recursive=True)
for p in paths:
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(p, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            per_op = defaultdict(float)
            per_cnt = defaultdict(int)
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name.split(" = ")[0]
                per_op[name] += ev.duration_ps / 1e9
                per_cnt[name] += 1
            total = sum(per_op.values()) / N_SCAN
            print(f"== plane '{plane.name}' line 'XLA Ops': busy "
                  f"{total:.2f} ms/iter, {len(per_op)} distinct")

            def info(name):
                return hlo_def.get(name.lstrip("%"), ("?", ""))

            print("-- top 70 individual ops (ms/iter):")
            for name, d in sorted(per_op.items(), key=lambda kv: -kv[1])[:70]:
                shape, opn = info(name)
                print(f"  {d/N_SCAN:7.3f} x{per_cnt[name]//N_SCAN:<3} "
                      f"{name[:34]:34s} {shape[:40]:40s} "
                      f"{'/'.join(opn.split('/')[-3:])[:70]}")

            print("-- copy/transpose/reshape/slice/concat groups by "
                  "(shape, module):")
            grp = defaultdict(float)
            gcnt = defaultdict(int)
            for name, d in per_op.items():
                base = name.lstrip("%")
                if not re.match(
                    r"(copy|transpose|reshape|slice|concatenate|bitcast|pad)",
                        base):
                    continue
                shape, opn = info(name)
                key = (shape, "/".join(opn.split("/")[-3:])[:60])
                grp[key] += d
                gcnt[key] += per_cnt[name]
            tot_copy = sum(grp.values()) / N_SCAN
            print(f"   (total data-movement busy: {tot_copy:.2f} ms/iter)")
            for (shape, opn), d in sorted(grp.items(),
                                          key=lambda kv: -kv[1])[:30]:
                print(f"  {d/N_SCAN:7.3f} x{gcnt[(shape, opn)]//N_SCAN:<4} "
                      f"{shape[:44]:44s} {opn}")

            print("-- busy grouped by source module (op_name 2nd-to-last):")
            mod = defaultdict(float)
            for name, d in per_op.items():
                _, opn = info(name)
                parts = opn.split("/")
                key = "/".join(parts[3:6]) if len(parts) > 5 else opn[:60]
                mod[key] += d
            for k, d in sorted(mod.items(), key=lambda kv: -kv[1])[:35]:
                print(f"  {d/N_SCAN:7.3f}  {k[:90]}")
