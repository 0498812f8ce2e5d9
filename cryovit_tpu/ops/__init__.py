"""TPU compute ops: Pallas kernels and matmul-form image ops."""

from cryovit_tpu.ops.resize import (
    bicubic_resize_matrix,
    resize_bicubic_2d,
    resize_slices,
)

__all__ = ["bicubic_resize_matrix", "resize_bicubic_2d", "resize_slices"]
