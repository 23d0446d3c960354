"""Detailed scanned-trace attribution: top INDIVIDUAL ops cross-referenced
with the optimized HLO (shape + source metadata), aimed at the two opaque
buckets in the r4 accounting — 'layout copies' (11.6 ms/iter, 906 copies)
and 'everything else' (~30 ms).

Prints, per iteration of the scan(9) bench regime:
- top 60 individual ops (ms, count-collapsed by stripped name kept separate)
- every copy/bitcast/transpose >= 30us with its HLO shape and op_name
  metadata (which module/layer produced it)
- 'everything else' members: ops outside the known kernel/fusion buckets
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


print("lowering + compiling...", flush=True)
lowered = fwd_scan.lower(variables, img)
compiled = lowered.compile()
hlo_txt = compiled.as_text()
with open("/tmp/hlo_scan.txt", "w") as f:
    f.write(hlo_txt)
print(f"HLO dumped ({len(hlo_txt)/1e6:.1f} MB) to /tmp/hlo_scan.txt",
      flush=True)

# map HLO op name -> (shape, op_name metadata) from its definition line
hlo_def = {}
pat = re.compile(r"^\s*(?:ROOT )?%?([\w.-]+) = (\S+)")
meta_pat = re.compile(r'op_name="([^"]+)"')
for ln in hlo_txt.splitlines():
    m = pat.match(ln)
    if m:
        om = meta_pat.search(ln)
        hlo_def[m.group(1)] = (m.group(2), om.group(1) if om else "")

float(fwd_scan(variables, img))
outdir = "/tmp/jaxtrace_detail"
os.system(f"rm -rf {outdir}")
with jax.profiler.trace(outdir):
    float(fwd_scan(variables, img))
print("traced", flush=True)

paths = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)
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
            per_op = defaultdict(float)
            per_cnt = defaultdict(int)
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                per_op[name] += ev.duration_ps / 1e9
                per_cnt[name] += 1
            total = sum(per_op.values()) / N_SCAN
            print(f"== busy {total:.2f} ms/iter, {len(per_op)} distinct ops",
                  flush=True)
            print("-- top 60 individual ops (ms/iter):", flush=True)
            rows = sorted(per_op.items(), key=lambda kv: -kv[1])[:60]
            for name, d in rows:
                base = name.split(" = ")[0]
                shape, opn = hlo_def.get(base, ("?", ""))
                print(f"  {d/N_SCAN:7.3f} x{per_cnt[name]//N_SCAN:<3} "
                      f"{base[:40]:40s} {shape[:44]:44s} "
                      f"{opn.split('/')[-1][:60]}", flush=True)
            # copies specifically, grouped by shape
            print("-- copies/bitcast-convert/transposes by HLO shape:",
                  flush=True)
            by_shape = defaultdict(float)
            sh_cnt = defaultdict(int)
            sh_where = {}
            for name, d in per_op.items():
                base = name.split(" = ")[0]
                if not re.match(r"(copy|transpose|bitcast)", base):
                    continue
                shape, opn = hlo_def.get(base, ("?", ""))
                by_shape[shape] += d
                sh_cnt[shape] += per_cnt[name]
                if shape not in sh_where or d > by_shape.get(shape, 0) * .5:
                    sh_where[shape] = opn
            for shape, d in sorted(by_shape.items(), key=lambda kv: -kv[1])[:25]:
                print(f"  {d/N_SCAN:7.3f} x{sh_cnt[shape]//N_SCAN:<4} "
                      f"{shape[:60]:60s} {sh_where[shape].split('/')[-1][:50]}",
                      flush=True)
