"""Multimodal SAM-Adapter, TPU-native.

A ground-up JAX/XLA/Pallas re-design of the capability surface of
iacopo97/Multimodal-SAM-Adapter (multimodal semantic segmentation with a
SAM ViT-L encoder + ViT-Adapter-style multimodal adapter), built TPU-first:

- compute path: flax.linen modules, NHWC layouts, bf16-friendly, static shapes
- hot ops: fused multi-scale deformable attention and windowed rel-pos
  attention (`ops/`), with pure-XLA oracles and Pallas kernels
- parallelism: one `jax.sharding.Mesh`; data parallelism is batch-axis
  sharding under jit (XLA inserts the collectives; SyncBN == global-batch BN)
- engine: optax train step (layer-decay AdamW, poly LR, grad accumulation),
  orbax checkpoints, torch->jax checkpoint ingestion

Reference layer map: /root/reference/segmentation (see SURVEY.md).
"""

__version__ = "0.1.0"
