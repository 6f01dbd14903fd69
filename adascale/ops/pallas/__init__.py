"""Pallas TPU kernels for the hot compute blocks.

Every kernel has an XLA twin in adascale.models / adascale.ops with
identical semantics and shared parameters; Pallas here is an optimization,
never a semantic (SURVEY.md §7 design stance). Parity is enforced by
tests/test_pallas.py in interpreter mode on CPU and loosely on TPU.
"""
from .backbone import convnext_forward_pallas
from .convnext_block import fused_convnext_block

__all__ = [
    "convnext_forward_pallas",
    "fused_convnext_block",
]
