"""Tensor-parallel equivalence: forward under a (data, model) mesh with
sharded attention/MLP weights must match the replicated forward."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_sam_adapter_tpu.models.segmentor import EncoderDecoder
from multimodal_sam_adapter_tpu.parallel.mesh import make_mesh
from multimodal_sam_adapter_tpu.parallel.tp import shard_params_tp, tp_spec
from tests.test_model_forward import TINY_BACKBONE


def test_tp_rules():
    class L:
        ndim = 2
        shape = (32, 96)

    assert tp_spec("backbone/interactions_0/vit_block_0/attn/qkv/kernel",
                   L()) == P(None, "model")
    assert tp_spec("backbone/interactions_0/vit_block_0/attn/proj/kernel",
                   L()) == P("model", None)
    assert tp_spec("backbone/up/kernel", L()) == P()


def test_tp_forward_matches_replicated():
    model = EncoderDecoder(num_classes=5, head_channels=16,
                           backbone_cfg=TINY_BACKBONE)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 6))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    want = np.asarray(model.apply(variables, x, train=False))

    mesh = make_mesh(("data", "model"), shape=(2, 4))
    params = shard_params_tp(variables["params"], mesh)
    stats = jax.device_put(variables["batch_stats"],
                           NamedSharding(mesh, P()))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def fwd(p, s, x):
        return model.apply({"params": p, "batch_stats": s}, x, train=False)

    got = np.asarray(fwd(params, stats, xs))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
