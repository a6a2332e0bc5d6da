"""neural_motifs_tpu: a TPU-native scene-graph framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
rowanz/neural-motifs (CVPR 2018 "Neural Motifs: Scene Graph Parsing with
Global Context"): Faster R-CNN style detection (VGG16 + RPN), MotifNet and
Stanford message-passing relation heads, frequency baseline, and scene-graph
Recall@K evaluation — built TPU-first:

  * static shapes + masks instead of ragged tensors / PackedSequence
  * MXU-formulated RoIAlign (interpolation matmuls) instead of CUDA gather
  * fixpoint greedy NMS on-device instead of host-scan bitmask NMS
  * lax.scan highway LSTMs instead of the hand-written CUDA kernel
  * pjit/shard_map data parallelism over a jax.sharding.Mesh instead of
    replicate/scatter/gather

Reference layer map: /root/reference (see SURVEY.md).
"""

__version__ = "0.1.0"
