import traceback, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
key = jax.random.PRNGKey(0)
from multimodal_sam_adapter_tpu.ops.msda_pallas import ms_deform_attn_pallas_fwd
D, M = 32, 16
val = jax.random.normal(key, (1, 4096, M, D), jnp.bfloat16)
loc = jax.random.uniform(key, (1, 512, M, 1, 4, 2), jnp.bfloat16)
att = jax.nn.softmax(jax.random.normal(key, (1, 512, M, 1, 4)), -1).astype(jnp.bfloat16)
for variant in ("gather", "loads"):
    try:
        out = jax.jit(lambda v, l, a: ms_deform_attn_pallas_fwd(v, ((64, 64),), l, a, variant=variant))(val, loc, att)
        print(variant, "OK", float(jnp.sum(out.astype(jnp.float32))), flush=True)
    except Exception as e:
        print(variant, "FAIL:", flush=True)
        traceback.print_exc()
from multimodal_sam_adapter_tpu.ops.flash_attention import flash_attention_rel_pos
q0 = jax.random.normal(key, (4, 4096, 64), jnp.bfloat16)
rp = jax.random.normal(key, (127, 64), jnp.bfloat16)
try:
    o = jax.jit(lambda q: flash_attention_rel_pos(q, q, q, rp, rp, (64, 64), 0.125))(q0)
    print("flash OK", float(jnp.sum(o.astype(jnp.float32))), flush=True)
except Exception:
    print("flash FAIL:", flush=True)
    traceback.print_exc()
