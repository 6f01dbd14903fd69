"""Pallas TPU kernels for the hot compute blocks.

Every kernel has an XLA twin in adascale.models / adascale.ops with
identical semantics and shared parameters; Pallas here is an optimization,
never a semantic (SURVEY.md §7 design stance). Parity is enforced by
tests/test_pallas.py in interpreter mode on CPU and loosely on TPU.
"""
from .backbone import convnext_forward_pallas, convnext_forward_pallas_train
from .convnext_block import block_xla, fused_convnext_block, make_trainable_block
from .fpn_heads import forward_rough_from_features_fused, fused_rough_heads
from .fpn_neck import fpn_neck_forward_fused, fused_neck_l0
from .precise_heads import forward_precise_from_features_fused

__all__ = [
    "block_xla",
    "convnext_forward_pallas",
    "convnext_forward_pallas_train",
    "forward_precise_from_features_fused",
    "forward_rough_from_features_fused",
    "fpn_neck_forward_fused",
    "fused_convnext_block",
    "fused_neck_l0",
    "fused_rough_heads",
    "make_trainable_block",
]
