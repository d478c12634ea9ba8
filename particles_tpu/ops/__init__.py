"""Pallas TPU kernels for the hot particle operations (SURVEY.md §2a).

The measured-slower experimental repeat kernels (v2 row-granular grid,
v3 dynamic boundary-row fori) were removed in round 2; their post-mortems
live in CLAUDE.md ("Mosaic wants statically scheduled dense tiles").
"""

from particles_tpu.ops.cummax_kernel import running_max  # noqa: F401
from particles_tpu.ops.guard import no_pallas, pallas_allowed  # noqa: F401
from particles_tpu.ops.merge_rank_kernel import merge_rank_counts  # noqa: F401
from particles_tpu.ops.repeat_kernel import (  # noqa: F401
    ancestors_by_z,
    dense_ancestors_by_z,
    make_repeat_plan,
    make_repeat_plan_su,
    repeat_by_counts,
    repeat_by_z,
    repeat_with_plan,
    repeat_with_plan_anc,
    repeat_with_plan_cols,
    serve_by_z,
)
