"""Probe: patchify formulations for thin-channel images.

The scanned trace charges ~1.7 ms/forward to the two ConvNeXt stems'
space-to-depth (reshape (1,256,4,256,4,3) 0.565 ms + copy 0.268 ms each):
rearranging a 6 MB image costs 40x its bandwidth floor because the minor
dims are 3-4 elements wide. Variants measured at flagship geometry
(1024x1024x6 -> two 4x4 stems to 96ch + one 16x16 ViT stem to 1024ch):

  A. current: split x/y, PatchifyDense each (reshape+transpose per branch)
     + ViT PatchEmbed on the 6ch image
  B. shared s2d: ONE (1024,1024,6)->(256,256,96) space-to-depth; stems
     become plain Dense on 48-lane slices; ViT = nested (4,4) s2d of the
     96ch map (efficient lanes) with row-permuted kernel
  C. XLA convs directly on the thin-channel image
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
key = jax.random.PRNGKey(0)

B, S, Cin = 1, 1024, 6
F1 = 96      # convnext stem features per branch
FV = 1024    # vit embed
img = jax.random.normal(key, (B, S, S, Cin), jnp.bfloat16)
kx = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 3, F1),
                       jnp.bfloat16) * 0.1
ky = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 3, F1),
                       jnp.bfloat16) * 0.1
kv = jax.random.normal(jax.random.PRNGKey(3), (16, 16, 6, FV),
                       jnp.bfloat16) * 0.02


def s2d(x, P):
    Bx, H, W, C = x.shape
    x = x.reshape(Bx, H // P, P, W // P, P, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(Bx, H // P, W // P, P * P * C)


def path_a(img):
    x, y = img[..., :3], img[..., 3:]
    ox = s2d(x, 4) @ kx.reshape(48, F1)
    oy = s2d(y, 4) @ ky.reshape(48, F1)
    ov = s2d(img, 16) @ kv.reshape(16 * 16 * 6, FV)
    return ox, oy, ov


# B: one shared 4x4 s2d; stems read interleaved 96ch columns; the ViT
# kernel's rows are permuted so the nested (4,4,(4,4,6)) order matches
# its (16,16,6) flattening — a static weight permutation, free at trace
# time.
def _nested_perm():
    # s2d(s2d(img,4),4) flattens as (ph2, pw2, (ph1, pw1, c)); the ViT
    # kernel flattens (ph, pw, c) with ph = ph2*4+ph1 etc.
    idx = np.arange(16 * 16 * 6).reshape(16, 16, 6)
    out = np.zeros(16 * 16 * 6, np.int64)
    k = 0
    for ph2 in range(4):
        for pw2 in range(4):
            for ph1 in range(4):
                for pw1 in range(4):
                    for c in range(6):
                        out[k] = idx[ph2 * 4 + ph1, pw2 * 4 + pw1, c]
                        k += 1
    return out


PERM = _nested_perm()
kv_perm = kv.reshape(16 * 16 * 6, FV)[PERM]
# stems read channels c<3 (x) / c>=3 (y) of every (ph,pw) group
idx96 = np.arange(96).reshape(4, 4, 6)
kx96 = jnp.zeros((96, F1), jnp.bfloat16).at[
    idx96[:, :, :3].reshape(-1)].set(kx.reshape(48, F1))
ky96 = jnp.zeros((96, F1), jnp.bfloat16).at[
    idx96[:, :, 3:].reshape(-1)].set(ky.reshape(48, F1))


def path_b(img):
    base = s2d(img, 4)                       # (1, 256, 256, 96)
    ox = base @ kx96
    oy = base @ ky96
    ov = s2d(base, 4) @ kv_perm              # (1, 64, 64, 1536) @ (1536, FV)
    return ox, oy, ov


def path_c(img):
    x, y = img[..., :3], img[..., 3:]
    dn = ("NHWC", "HWIO", "NHWC")
    ox = jax.lax.conv_general_dilated(x, kx, (4, 4), "VALID",
                                      dimension_numbers=dn)
    oy = jax.lax.conv_general_dilated(y, ky, (4, 4), "VALID",
                                      dimension_numbers=dn)
    ov = jax.lax.conv_general_dilated(img, kv, (16, 16), "VALID",
                                      dimension_numbers=dn)
    return ox, oy, ov


# parity
ra = [o.astype(jnp.float32) for o in path_a(img)]
for name, fn in (("B", path_b), ("C", path_c)):
    rb = [o.astype(jnp.float32) for o in fn(img)]
    errs = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(ra, rb)]
    print(f"path {name} max errs vs A: {[f'{e:.4f}' for e in errs]}",
          flush=True)


def scan_over(fn, n):
    def f(x):
        def body(c, _):
            outs = fn(x + c)
            return c + jnp.bfloat16(1e-3), sum(
                o.astype(jnp.float32).sum() for o in outs)
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return f


def measure(name, fn, *args, n_big=17):
    try:
        ts = {}
        for n in (1, n_big):
            f = jax.jit(scan_over(fn, n))
            float(f(*args))
            best = 1e9
            for _ in range(5):
                t0 = time.perf_counter(); float(f(*args))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        per = (ts[n_big] - ts[1]) / (n_big - 1)
        print(f"{name}: {per*1000:.3f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:160]}", flush=True)


measure("A current (split + 3x s2d)", path_a, img)
measure("B shared s2d + perm kernels", path_b, img)
measure("C XLA convs", path_c, img)
