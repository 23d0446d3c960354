"""End-to-end model smoke tests on a tiny configuration.

Validates the full graph: SPM (twin ConvNeXt + fusion neck) -> 4 interaction
stages -> pyramid assembly -> SegFormer head -> OHEM loss -> grads.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multimodal_sam_adapter_tpu.models.segmentor import EncoderDecoder

TINY_BACKBONE = dict(
    img_size=64,
    patch_size=16,
    embed_dim=32,
    depth=4,
    num_heads=2,
    drop_path_rate=0.1,
    conv_drop_path_rate=0.1,
    conv_inplane=40,
    n_points=2,
    deform_num_heads=4,
    init_values=1e-6,
    cffn_ratio=0.25,
    deform_ratio=0.5,
    interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)),
    global_attn_indexes=(1, 3),
    window_size=2,
    pretrained_size=64,
    modalities_ch=(3, 3),
    arch="atto",
)


@pytest.fixture(scope="module")
def model_and_vars():
    model = EncoderDecoder(num_classes=7, head_channels=16,
                           backbone_cfg=TINY_BACKBONE)
    x = jnp.ones((1, 64, 64, 6))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def test_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    x = jnp.ones((2, 64, 64, 6))
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 64, 64, 7)
    assert np.isfinite(np.asarray(logits)).all()


def test_backbone_pyramid_shapes(model_and_vars):
    model, variables = model_and_vars
    x = jnp.ones((1, 64, 64, 6))
    feats = model.apply(variables, x, train=False, method=model.features)
    assert [tuple(f.shape) for f in feats] == [
        (1, 16, 16, 32), (1, 8, 8, 32), (1, 4, 4, 32), (1, 2, 2, 32),
    ]


def test_train_step_grads(model_and_vars):
    model, variables = model_and_vars
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    x = jnp.ones((1, 64, 64, 6))
    y = jnp.zeros((1, 64, 64), jnp.int32).at[0, :10].set(255)

    def loss_fn(p):
        (loss, _), updates = model.apply(
            {"params": p, **rest}, x, y,
            method=model.loss,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # gradients reach both the ViT stream and the SPM
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(g * g) for g in flat))
    )
    assert gnorm > 0


def test_single_modality_backbone():
    """RGB-only config routes through the conv-stem SpatialPriorModule."""
    cfg = dict(TINY_BACKBONE, modalities_ch=(3,), conv_inplane=16)
    model = EncoderDecoder(num_classes=4, head_channels=8, backbone_cfg=cfg)
    x = jnp.ones((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    assert "stem1" in variables["params"]["backbone"]["spm"]
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (1, 64, 64, 4)


@pytest.mark.smoke
def test_ohem_matches_torch_semantics():
    """OHEM loss vs an independent torch expression of the PIDNet OHEM."""
    import torch
    import torch.nn.functional as F
    from multimodal_sam_adapter_tpu.models.losses import ohem_cross_entropy

    rng = np.random.default_rng(0)
    B, H, W, C = 2, 8, 8, 5
    logits = rng.standard_normal((B, H, W, C)).astype(np.float32) * 3
    labels = rng.integers(0, C, (B, H, W)).astype(np.int32)
    labels[0, :2] = 255  # some ignored pixels

    for min_kept in (5, 30, 1000):
        got = float(ohem_cross_entropy(
            jnp.array(logits), jnp.array(labels), thresh=0.7, min_kept=min_kept,
        ))

        t_logits = torch.from_numpy(logits).permute(0, 3, 1, 2)
        t_labels = torch.from_numpy(labels).long()
        pred = F.softmax(t_logits, dim=1)
        losses = F.cross_entropy(t_logits, t_labels, ignore_index=255,
                                 reduction="none").view(-1)
        mask = t_labels.view(-1) != 255
        tmp = t_labels.clone()
        tmp[tmp == 255] = 0
        pred_t = pred.gather(1, tmp.unsqueeze(1)).view(-1)[mask]
        pred_sorted, ind = pred_t.sort()
        min_value = pred_sorted[min(min_kept, pred_sorted.numel() - 1)]
        threshold = max(float(min_value), 0.7)
        kept = losses[mask][ind]
        kept = kept[pred_sorted < threshold]
        want = float(kept.mean()) if kept.numel() else 0.0
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


@pytest.mark.smoke
def test_ohem_per_sample_matches_per_rank_reference_scope():
    """per_sample=True == the reference's per-RANK threshold at the shipped
    samples_per_gpu=1: a B-sample per-sample loss must equal the mean of B
    independent single-sample global calls (each of which the torch oracle
    above pins), for ANY data-parallel layout of the B samples. Pins the
    PARITY.md OHEM-scope contract (reference ohem_cross_entropy_loss.py:
    56-96 thresholds per local batch; DDP then grad-means ranks)."""
    from multimodal_sam_adapter_tpu.models.losses import ohem_cross_entropy

    rng = np.random.default_rng(1)
    B, H, W, C = 3, 8, 8, 5
    logits = rng.standard_normal((B, H, W, C)).astype(np.float32) * 3
    labels = rng.integers(0, C, (B, H, W)).astype(np.int32)
    labels[0, :3] = 255
    labels[2] = 255  # one rank with NO valid pixels: contributes 0 to mean

    for min_kept in (5, 30, 1000):
        got = float(ohem_cross_entropy(
            jnp.array(logits), jnp.array(labels), thresh=0.7,
            min_kept=min_kept, per_sample=True,
        ))
        want = np.mean([
            float(ohem_cross_entropy(
                jnp.array(logits[i : i + 1]), jnp.array(labels[i : i + 1]),
                thresh=0.7, min_kept=min_kept,
            ))
            for i in range(B)
        ])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
