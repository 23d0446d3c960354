"""ZeRO-1 state sharding: train step with sharded optimizer state matches
the replicated step."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_sam_adapter_tpu.engine.train import (
    init_train_state,
    make_train_step,
)
from multimodal_sam_adapter_tpu.models.segmentor import EncoderDecoder
from multimodal_sam_adapter_tpu.parallel.mesh import make_mesh
from multimodal_sam_adapter_tpu.parallel.zero import shard_opt_state
from tests.test_model_forward import TINY_BACKBONE


def test_zero_sharded_state_matches_replicated():
    model = EncoderDecoder(num_classes=5, head_channels=16,
                           backbone_cfg=TINY_BACKBONE)
    state = init_train_state(
        model, (1, 64, 64, 6), jax.random.PRNGKey(0),
        optimizer_kwargs=dict(steps_per_epoch=4, max_epochs=2,
                              warmup_epochs=1),
    )
    step = make_train_step(model, ohem_min_kept=128, donate=False)
    batch = {
        "img": jax.random.normal(jax.random.PRNGKey(1), (8, 64, 64, 6)),
        "gt": jnp.zeros((8, 64, 64), jnp.int32),
    }
    rng = jax.random.PRNGKey(2)
    s_ref, m_ref = step(state, batch, rng)

    mesh = make_mesh(("data",))
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    state_z = jax.device_put(state, repl).replace(
        opt_state=shard_opt_state(jax.device_get(state.opt_state), mesh)
    )
    batch_z = jax.tree.map(lambda x: jax.device_put(x, shard), batch)
    s_z, m_z = step(state_z, batch_z, rng)

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_z["loss"]),
                               rtol=1e-5)
    # Adam's first step normalizes g/|g|, amplifying reduction-order ULP
    # differences (all-reduce vs reduce-scatter) to update scale; compare at
    # update magnitude (lr*warmup = 2e-5).
    a = jax.tree_util.tree_leaves(jax.device_get(s_ref.params))
    b = jax.tree_util.tree_leaves(jax.device_get(s_z.params))
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-3, atol=1e-4)
