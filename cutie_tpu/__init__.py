"""cutie_tpu — a TPU-native (JAX/XLA/Pallas) video object segmentation framework.

Re-designed from scratch with the capabilities of hkchengrex/Cutie
("Putting the Object Back into Video Object Segmentation", CVPR 2024):
streaming multi-object mask propagation with a three-tier attention memory
(sensory / working / long-term + permanent) and an object transformer.

Design stance (TPU-first):
  - functional core: all per-frame compute + memory mutation is a
    jit-compiled pure function over fixed-shape pytrees (ring buffers with
    validity masks instead of growing tensors);
  - objects are a padded static axis, masked by a selector;
  - NHWC layouts, bf16 matmul paths with fp32-forced numerics where the
    reference forces fp32 (attention affinity, GRUs, final logits);
  - multi-device scaling via jax.sharding.Mesh + XLA collectives.
"""

__version__ = "0.1.0"
