"""adascale: TPU-native adaptive-scaling OCR text detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``vkit-dev/vkit-ocr-model-adaptive-scaling`` (``vkit_open_model``): a
character-level OCR text detector that runs a rough pass (char mask + char
height map) over a downsampled page, adaptively rescales each text region so
its median char height hits a canonical value, stacks the flattened regions,
and runs a precise pass (char prob heatmap + char box geometry) over the
stacked image.

Design stance (not a port):
  * NHWC everywhere; Flax linen modules; functional jitted train/infer steps.
  * Exact-parity resize/pool primitives (torch ``F.interpolate`` and cv2
    ``INTER_AREA`` semantics) so outputs match the PyTorch reference within
    1e-3 while running natively on TPU.
  * Data-parallel training via ``jax.sharding.Mesh`` + jit sharding
    propagation (XLA inserts the ICI collectives).
"""

__version__ = "0.1.0"
