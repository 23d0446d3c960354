"""Training-engine integration tests on the tiny model (CPU, 8 devices).

- optimizer semantics: layer-decay scales, weight-decay mask, poly schedule
- 3 jitted train steps run, loss finite, params change, grad-accum boundary
- checkpoint save -> restore round-trip through orbax
- data-parallel: same step under an 8-device mesh matches single-device
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multimodal_sam_adapter_tpu.engine.optim import (
    layer_decay_scales,
    weight_decay_mask,
    poly_schedule_with_exp_warmup,
    vit_layer_id,
)
from multimodal_sam_adapter_tpu.engine.train import (
    init_train_state,
    make_train_step,
)
from multimodal_sam_adapter_tpu.models.segmentor import EncoderDecoder
from tests.test_model_forward import TINY_BACKBONE

pytestmark = pytest.mark.slow


@pytest.mark.smoke
def test_layer_id_rules():
    assert vit_layer_id("backbone/pos_embed", 24) == 0
    assert vit_layer_id("backbone/patch_embed/proj/kernel", 24) == 0
    assert vit_layer_id("backbone/spm/twin_conv/branch_x/stem_conv/kernel", 24) == 0
    assert vit_layer_id("backbone/interactions_2/vit_block_13/attn/qkv/kernel",
                        24) == 14
    assert vit_layer_id("backbone/interactions_0/injector/gamma", 24) == 25
    assert vit_layer_id("decode_head/conv_seg/kernel", 24) == 25


@pytest.mark.smoke
def test_scales_and_wd_mask():
    params = {
        "backbone": {
            "pos_embed": jnp.zeros((1, 4, 4, 8)),
            "interactions_0": {"vit_block_0": {"attn": {"qkv": {
                "kernel": jnp.zeros((8, 24)), "bias": jnp.zeros((24,))}}}},
            "spm": {
                "twin_conv": {"stem_norm": {"ln": {"scale": jnp.zeros((8,))}}},
                "smart_fusion": {"fc": {"kernel": jnp.zeros((8, 8))}},
            },
        },
    }
    scales = layer_decay_scales(params, num_layers=24, decay_rate=0.9)
    # pos_embed layer 0 -> 0.9^25 ; block 0 -> layer 1 -> 0.9^24
    np.testing.assert_allclose(
        scales["backbone"]["pos_embed"], 0.9 ** 25, rtol=1e-6)
    np.testing.assert_allclose(
        scales["backbone"]["interactions_0"]["vit_block_0"]["attn"]["qkv"]["kernel"],
        0.9 ** 24, rtol=1e-6)
    mask = weight_decay_mask(params)
    assert mask["backbone"]["interactions_0"]["vit_block_0"]["attn"]["qkv"]["kernel"]
    assert not mask["backbone"]["interactions_0"]["vit_block_0"]["attn"]["qkv"]["bias"]
    # twin_conv 1-D STILL decays (reference exemption)
    assert mask["backbone"]["spm"]["twin_conv"]["stem_norm"]["ln"]["scale"]
    # smart_fusion never decays
    assert not mask["backbone"]["spm"]["smart_fusion"]["fc"]["kernel"]


@pytest.mark.smoke
def test_poly_exp_warmup_schedule():
    sched = poly_schedule_with_exp_warmup(
        base_lr=1.0, steps_per_epoch=10, max_epochs=10, power=0.9,
        warmup_epochs=2, warmup_ratio=0.1,
    )
    # at step 0: warmup factor 0.1^(1-0) = 0.1, poly coeff 1
    np.testing.assert_allclose(float(sched(0)), 0.1, rtol=1e-5)
    # at warmup end (step 20): epoch 2 -> poly (1-0.2)^0.9
    np.testing.assert_allclose(float(sched(20)), 0.8 ** 0.9, rtol=1e-5)
    # final epoch start: (1-0.9)^0.9
    np.testing.assert_allclose(float(sched(90)), 0.1 ** 0.9, rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_state_and_step():
    model = EncoderDecoder(num_classes=5, head_channels=16,
                           backbone_cfg=TINY_BACKBONE)
    state = init_train_state(
        model, (1, 64, 64, 6), jax.random.PRNGKey(0),
        optimizer_kwargs=dict(steps_per_epoch=4, max_epochs=3,
                              warmup_epochs=1, grad_accum_steps=2),
    )
    step = make_train_step(model, ohem_min_kept=128, donate=False)
    return model, state, step


def test_train_steps_update_params(tiny_state_and_step):
    _, state, step = tiny_state_and_step
    rng = jax.random.PRNGKey(0)
    batch = {
        "img": jnp.ones((2, 64, 64, 6)),
        "gt": jnp.zeros((2, 64, 64), jnp.int32),
    }
    p0 = jax.tree.map(lambda x: np.asarray(x), state.params)
    losses = []
    for _ in range(3):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    # grad accumulation = 2: after step 1 params unchanged; after 2 changed
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), p0, state.params
    )
    total = sum(jax.tree_util.tree_leaves(diff))
    assert total > 0
    assert int(state.step) == 3


def test_checkpoint_roundtrip(tiny_state_and_step, tmp_path):
    from multimodal_sam_adapter_tpu.engine.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    _, state, _ = tiny_state_and_step
    path = save_checkpoint(str(tmp_path / "ckpts"), state, step=7, max_keep=2)
    payload = restore_checkpoint(path)
    assert int(payload["step"]) == 7
    flat_a = jax.tree_util.tree_leaves(payload["params"])
    flat_b = jax.tree_util.tree_leaves(jax.device_get(state.params))
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_data_parallel_matches_single_device(tiny_state_and_step):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from multimodal_sam_adapter_tpu.parallel.mesh import make_mesh

    model, state, step = tiny_state_and_step
    rng = jax.random.PRNGKey(3)
    img = jax.random.normal(jax.random.PRNGKey(4), (8, 64, 64, 6))
    gt = jnp.zeros((8, 64, 64), jnp.int32)

    # single device
    s1, m1 = step(state, {"img": img, "gt": gt}, rng)

    # 8-device mesh
    mesh = make_mesh(("data",))
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    state8 = jax.device_put(state, repl)
    batch8 = {"img": jax.device_put(img, shard), "gt": jax.device_put(gt, shard)}
    s8, m8 = step(state8, batch8, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    a = jax.tree_util.tree_leaves(jax.device_get(s1.params))
    b = jax.tree_util.tree_leaves(jax.device_get(s8.params))
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5)


def test_factored_second_moment_optimizer():
    """factored_second_moment=True must (a) optimize, (b) carry no full-size
    f32 second-moment state for matrices (the 1024^2 single-chip enabler)."""
    import numpy as np
    import optax
    from multimodal_sam_adapter_tpu.engine.optim import make_optimizer

    rng = np.random.default_rng(0)
    params = {"w": jnp.asarray(rng.normal(size=(256, 192)), jnp.float32),
              "b": jnp.zeros((192,), jnp.float32)}
    target = {"w": jnp.asarray(rng.normal(size=(256, 192)), jnp.float32),
              "b": jnp.ones((192,), jnp.float32)}
    tx = make_optimizer(params, base_lr=0.05, num_layers=1,
                        steps_per_epoch=10, max_epochs=10, warmup_epochs=0,
                        factored_second_moment=True)
    state = tx.init(params)

    # no state leaf may be a full (256, 192) f32 tensor (factored rows/cols
    # only; momentum is bf16)
    for leaf in jax.tree.leaves(state):
        if hasattr(leaf, "shape") and tuple(leaf.shape) == (256, 192):
            assert leaf.dtype != jnp.float32, "full f32 nu leaked"

    def loss_fn(p):
        return sum(jnp.sum((p[k] - target[k]) ** 2) for k in p)

    l0 = float(loss_fn(params))
    for _ in range(60):
        g = jax.grad(loss_fn)(params)
        upd, state = tx.update(g, state, params)
        params = optax.apply_updates(params, upd)
    assert float(loss_fn(params)) < 0.2 * l0


def test_twin_convnext_freeze_mask():
    """freeze_stages equivalent (reference twin_convnext.py:478-493): the
    optimizer mask zeroes both branches' downsample + stage blocks of the
    first N stages; out-norms and later stages stay trainable."""
    from multimodal_sam_adapter_tpu.engine.optim import (
        twin_convnext_freeze_mask,
    )

    params = {
        "spm": {"twin_conv": {
            "branch_x": {
                "stem_conv": {"kernel": 1.0},
                "stem_norm": {"scale": 1.0},
                "down_conv1": {"kernel": 1.0},
                "down_norm1": {"scale": 1.0},
                "stage0_block0": {"w": 1.0},
                "stage1_block0": {"w": 1.0},
                "out_norm0": {"scale": 1.0},
            },
            "branch_y": {"stage0_block1": {"w": 1.0}},
        }},
        "blocks_0": {"stage0_block0": {"w": 1.0}},  # not in twin_conv branch
    }
    m = twin_convnext_freeze_mask(params, frozen_stages=1)
    tx = m["spm"]["twin_conv"]["branch_x"]
    assert tx["stem_conv"]["kernel"] == 0.0
    assert tx["stem_norm"]["scale"] == 0.0
    assert tx["stage0_block0"]["w"] == 0.0
    assert m["spm"]["twin_conv"]["branch_y"]["stage0_block1"]["w"] == 0.0
    assert tx["down_conv1"]["kernel"] == 1.0  # stage 1 not frozen
    assert tx["stage1_block0"]["w"] == 1.0
    assert tx["out_norm0"]["scale"] == 1.0  # out-norms stay trainable
    assert m["blocks_0"]["stage0_block0"]["w"] == 1.0  # outside twin_conv

    m2 = twin_convnext_freeze_mask(params, frozen_stages=2)
    tx2 = m2["spm"]["twin_conv"]["branch_x"]
    assert tx2["down_conv1"]["kernel"] == 0.0
    assert tx2["down_norm1"]["scale"] == 0.0
    assert tx2["stage1_block0"]["w"] == 0.0


@pytest.mark.slow
def test_tiny_model_overfits_one_batch():
    """End-to-end learning evidence: the full training step (loss -> grads
    -> layer-decay AdamW) overfits a single random batch — loss drops
    substantially and the predicted mask starts matching the labels.
    Mirrors the reference's de-facto integration criterion (training
    converges) without datasets."""
    model = EncoderDecoder(num_classes=5, head_channels=16,
                           backbone_cfg=TINY_BACKBONE)
    state = init_train_state(
        model, (1, 64, 64, 6), jax.random.PRNGKey(1),
        optimizer_kwargs=dict(steps_per_epoch=30, max_epochs=1,
                              warmup_epochs=0, base_lr=4e-3),
    )
    step = make_train_step(model, ohem_min_kept=4096, donate=False)
    rng = jax.random.PRNGKey(2)
    img = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 6))
    # learnable structure: class = quadrant index (deterministic fn of pos)
    yy, xx = np.mgrid[0:64, 0:64]
    gt = jnp.asarray((yy // 32) * 2 + (xx // 32), jnp.int32)[None]
    batch = {"img": img, "gt": gt}
    losses = []
    for i in range(30):
        state, m = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.6 * losses[0], losses


def test_resume_restores_opt_state_types_and_trains(tiny_state_and_step,
                                                    tmp_path):
    """Resume must restore the optax container types (MultiStepsState &
    co.), not plain dicts — found by the r5 on-chip soak: the first
    post-resume train step crashed with
    `'dict' object has no attribute 'gradient_step'` under grad_accum > 1.
    Restoring through the live-state template and TRAINING a step is the
    regression pin."""
    from multimodal_sam_adapter_tpu.engine.checkpoint import (
        restore_checkpoint, save_checkpoint,
    )

    _, state, step = tiny_state_and_step
    rng = jax.random.PRNGKey(7)
    batch = {"img": jnp.ones((2, 64, 64, 6)),
             "gt": jnp.zeros((2, 64, 64), jnp.int32)}
    state, _ = step(state, batch, rng)
    path = save_checkpoint(str(tmp_path / "ck"), state, step=1)

    payload = restore_checkpoint(path, target={
        "step": np.asarray(0),
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    })
    assert jax.tree_util.tree_structure(payload["opt_state"]) \
        == jax.tree_util.tree_structure(jax.device_get(state.opt_state))
    resumed = state.replace(
        step=np.asarray(payload["step"], np.int32) ,
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=payload["opt_state"],
    )
    resumed, m = step(resumed, batch, rng)   # crashed before the fix
    assert np.isfinite(float(m["loss"]))

    # the untyped restore (weights-only path) must still work
    raw = restore_checkpoint(path)
    flat_a = jax.tree_util.tree_leaves(raw["params"])
    flat_b = jax.tree_util.tree_leaves(jax.device_get(state.params))
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
