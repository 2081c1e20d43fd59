"""Pallas TPU kernels for the hot ops."""

from anatomix_tpu.ops.pallas.conv3x3 import conv3x3_same, make_block_weights

__all__ = ["conv3x3_same", "make_block_weights"]
