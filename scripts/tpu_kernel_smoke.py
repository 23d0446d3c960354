"""Fast on-chip compile+run smoke of the three production kernels at
flagship shapes — catches Mosaic lowering errors in seconds instead of a
12-minute full-model bench compile."""
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
key = jax.random.PRNGKey(0)

# 1. win_lane windowed attention
from multimodal_sam_adapter_tpu.ops.window_attention import (
    window_attention_laneblock,
)

qkv = jax.random.normal(key, (25, 196, 3072), jnp.bfloat16)
rph = jax.random.normal(key, (27, 64), jnp.bfloat16) * 0.1
rpw = jax.random.normal(key, (27, 64), jnp.bfloat16) * 0.1
o = window_attention_laneblock(qkv, rph, rpw, 14, 64 ** -0.5, num_heads=16)
print("win_lane ok", float(jnp.sum(o.astype(jnp.float32))), flush=True)

# 2. flash global attention (new default tiles)
from multimodal_sam_adapter_tpu.ops.flash_attention import (
    flash_attention_rel_pos_diff,
)

qkvt = jax.random.normal(key, (3, 16, 4096, 64), jnp.bfloat16)
rph = jax.random.normal(key, (127, 64), jnp.bfloat16) * 0.1
rpw = jax.random.normal(key, (127, 64), jnp.bfloat16) * 0.1
o = flash_attention_rel_pos_diff(qkvt, rph, rpw, (64, 64), 64 ** -0.5)
print("flash ok", float(jnp.sum(o.astype(jnp.float32))), flush=True)

# 3. digit-MSDA flat: extractor (single level) + injector (3 levels)
from multimodal_sam_adapter_tpu.ops.msda_pallas import (
    make_ms_deform_attn_flat,
)

B, M, D, P = 1, 16, 32, 4
# extractor: queries = 21504 pyramid tokens, value = 64x64 ViT grid
Lq, S = 21504, 4096
fn = make_ms_deform_attn_flat(((64, 64),), M, P)
val = jax.random.normal(key, (B, S, M * D), jnp.bfloat16)
offs = jax.random.normal(key, (B, Lq, M * 1 * P * 2), jnp.bfloat16)
att = jax.random.normal(key, (B, Lq, M * 1 * P), jnp.bfloat16)
refT = jax.random.uniform(key, (B, 2, Lq), jnp.float32)
o = fn(val, offs, att, refT)
print("extractor msda ok", float(jnp.sum(o.astype(jnp.float32))), flush=True)

# injector: queries = 4096 ViT tokens, values = 3 pyramid levels
shapes = ((128, 128), (64, 64), (32, 32))
S3 = sum(h * w for h, w in shapes)
fn3 = make_ms_deform_attn_flat(shapes, M, P)
val = jax.random.normal(key, (B, S3, M * D), jnp.bfloat16)
offs = jax.random.normal(key, (B, 4096, M * 3 * P * 2), jnp.bfloat16)
att = jax.random.normal(key, (B, 4096, M * 3 * P), jnp.bfloat16)
refT = jax.random.uniform(key, (B, 6, 4096), jnp.float32)
o = fn3(val, offs, att, refT)
print("injector msda ok", float(jnp.sum(o.astype(jnp.float32))), flush=True)
print("ALL KERNELS OK", flush=True)
