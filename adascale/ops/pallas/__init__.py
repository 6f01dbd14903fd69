"""Pallas TPU kernels for the hot compute blocks.

Every kernel has an XLA twin in adascale.models / adascale.ops with
identical semantics and shared parameters; Pallas here is an optimization,
never a semantic (SURVEY.md §7 design stance). Parity is enforced by
tests/test_pallas.py in interpreter mode on CPU and loosely on TPU.
"""
from .backbone import convnext_forward_pallas, convnext_forward_pallas_train
from .convnext_block import block_xla, fused_convnext_block, make_trainable_block

__all__ = [
    "block_xla",
    "convnext_forward_pallas",
    "convnext_forward_pallas_train",
    "fused_convnext_block",
    "make_trainable_block",
]
