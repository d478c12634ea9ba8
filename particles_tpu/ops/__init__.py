"""Pallas TPU kernels for the hot particle operations (SURVEY.md §2a)."""

from particles_tpu.ops.repeat_kernel import repeat_by_counts  # noqa: F401
