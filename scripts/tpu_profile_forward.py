"""Capture a jax.profiler device trace of the flagship forward and print the
top XLA ops by device time, grouped and attributed.
"""
import glob
import gzip
import os
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
key = jax.random.PRNGKey(0)

from __graft_entry__ import _flagship_model

model = _flagship_model(dtype=jnp.bfloat16)
img = jax.random.normal(key, (1, 1024, 1024, 6), jnp.bfloat16)
variables = jax.jit(model.init, static_argnames=("train",))(key, img,
                                                            train=False)
from multimodal_sam_adapter_tpu.utils.params import cast_inference_params

variables = cast_inference_params(variables)


@jax.jit
def fwd(variables, img):
    return jnp.sum(model.apply(variables, img, train=False)
                   .astype(jnp.float32))


print("compiling...", flush=True)
float(fwd(variables, img))
print("compiled; tracing...", flush=True)

outdir = "/tmp/jaxtrace"
os.system(f"rm -rf {outdir}")
with jax.profiler.trace(outdir):
    for _ in range(3):
        float(fwd(variables, img))
print("traced", flush=True)

# ---- parse xplane
paths = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)
print("xplane files:", paths, flush=True)
from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

for p in paths:
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(p, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        print(f"== plane: {plane.name}", flush=True)
        ev_meta = plane.event_metadata
        dur_by_name = defaultdict(float)
        cnt_by_name = defaultdict(int)
        total = 0.0
        for line in plane.lines:
            if "XLA Ops" not in line.name and "XLA Op" not in line.name:
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                d = ev.duration_ps / 1e9  # ms
                dur_by_name[name] += d
                cnt_by_name[name] += 1
                total += d
        if not dur_by_name:
            # fall back: dump line names
            print("  lines:", [l.name for l in plane.lines][:20], flush=True)
            continue
        print(f"  total op time {total:.1f} ms over 3 runs", flush=True)
        top = sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:60]
        for name, d in top:
            print(f"  {d/3:8.3f} ms  x{cnt_by_name[name]//3:<4} {name[:110]}",
                  flush=True)
