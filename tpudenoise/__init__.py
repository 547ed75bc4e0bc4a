"""tpudenoise — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
noise-injection + classical-denoising + Faster R-CNN evaluation stack of
`mahesh-kashyap-ml/image-denoising` (reference: tf-faster-rcnn fork).

Design goals (see SURVEY.md):
  * every hot op on device: noise synthesis, denoise stencils, RPN,
    NMS, RoI pooling, target assignment — no host round-trips.
  * static shapes end-to-end (padded box tensors + validity masks).
  * batched data parallelism over a `jax.sharding.Mesh` (the reference
    is single-image/single-GPU; we scale via DP from day one).
"""

__version__ = "0.1.0"
