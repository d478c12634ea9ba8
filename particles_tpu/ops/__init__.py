"""Pallas TPU kernels for the hot particle operations (SURVEY.md §2a)."""

from particles_tpu.ops.merge_rank_kernel import merge_rank_counts  # noqa: F401
from particles_tpu.ops.repeat_kernel import repeat_by_counts  # noqa: F401
from particles_tpu.ops.repeat_kernel_v2 import repeat_by_counts_v2  # noqa: F401
from particles_tpu.ops.repeat_kernel_v3 import repeat_by_counts_v3  # noqa: F401
