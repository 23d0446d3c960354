"""Trace the SCANNED flagship forward — the exact regime bench.py measures.

Prior traces profiled the unscanned forward, where loop-invariant weight
prep (hoisted inside scan) pollutes the accounting. This traces one
scan(9) program and attributes per-iteration steady-state device time:
top ops (grouped), busy vs idle, and gap-enders — all divided by 9.

Writes the xplane path so xplane_gaps.py / xplane_sync_gaps.py can re-parse.
"""
import glob
import os
import re
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
key = jax.random.PRNGKey(0)

from __graft_entry__ import _flagship_model

N_SCAN = 9

model = _flagship_model(dtype=jnp.bfloat16)
img = jax.random.normal(key, (1, 1024, 1024, 6), jnp.bfloat16)
variables = jax.jit(model.init, static_argnames=("train",))(key, img,
                                                            train=False)
from multimodal_sam_adapter_tpu.utils.params import cast_inference_params

variables = cast_inference_params(variables)


@jax.jit
def fwd_scan(variables, img):
    def body(c, _):
        out = model.apply(variables, img + c, train=False)
        return c + jnp.bfloat16(1e-3), jnp.sum(out.astype(jnp.float32))
    _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=N_SCAN)
    return s.sum()


print("compiling...", flush=True)
float(fwd_scan(variables, img))
t0 = time.perf_counter()
float(fwd_scan(variables, img))
print(f"compiled; scan({N_SCAN}) wall {time.perf_counter()-t0:.3f}s; "
      "tracing...", flush=True)

outdir = "/tmp/jaxtrace_scan"
os.system(f"rm -rf {outdir}")
with jax.profiler.trace(outdir):
    float(fwd_scan(variables, img))
print("traced", flush=True)

paths = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)
print("xplane files:", paths, flush=True)
from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

for p in paths:
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(p, "rb").read())
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
            # steady state: drop the first iteration's worth of events by
            # trimming the first 1/N of the span (warm-up prefetches differ)
            span_ps = evs[-1][0] + evs[-1][1] - evs[0][0]
            dur = defaultdict(float)
            cnt = defaultdict(int)
            total = 0.0
            cur_e = evs[0][0] + evs[0][1]
            gaps = []
            for s, d, name in evs[1:]:
                if s > cur_e:
                    gaps.append((s - cur_e, name))
                cur_e = max(cur_e, s + d)
            for s, d, name in evs:
                g = re.sub(r"\.\d+", "", name.split(" = ")[0])
                g = re.sub(r"fusion_?\d*", "fusion", g)
                dur[g] += d / 1e9
                cnt[g] += 1
                total += d / 1e9
            print(f"== span {span_ps/1e9/N_SCAN:.2f} ms/iter, busy "
                  f"{total/N_SCAN:.2f} ms/iter, idle "
                  f"{sum(g for g, _ in gaps)/1e9/N_SCAN:.2f} ms/iter over "
                  f"{len(gaps)//N_SCAN} gaps/iter", flush=True)
            print("-- top op groups (ms/iter):", flush=True)
            for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:45]:
                print(f"  {d/N_SCAN:8.3f} ms x{cnt[name]//N_SCAN:<5}"
                      f" {name[:110]}", flush=True)
            by_ender = defaultdict(float)
            ecnt = defaultdict(int)
            big = []
            for g, name in gaps:
                if g / 1e6 < 20.0:
                    by_ender["(gaps < 20us)"] += g / 1e9
                    ecnt["(gaps < 20us)"] += 1
                    continue
                k = re.sub(r"\.\d+", "", name.split(" = ")[0])
                by_ender[k] += g / 1e9
                ecnt[k] += 1
                big.append((g, name))
            print("-- idle charged to gap-ending op (ms/iter):", flush=True)
            for k, d in sorted(by_ender.items(), key=lambda kv: -kv[1])[:20]:
                print(f"  {d/N_SCAN:8.3f} ms x{ecnt[k]//N_SCAN:<5} {k[:100]}",
                      flush=True)
            print("-- 15 largest individual gaps:", flush=True)
            for g, name in sorted(big, reverse=True)[:15]:
                print(f"  {g/1e9:8.3f} ms  {name[:140]}", flush=True)
