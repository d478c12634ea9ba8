"""Multi-chip execution: particle-axis and run-axis sharding over a Mesh."""

from particles_tpu.parallel.sharded import (  # noqa: F401
    make_mesh,
    particle_constrain,
    run_sharded_smc,
    run_sharded_multismc,
)
from particles_tpu.parallel.distributed import (  # noqa: F401
    ring_systematic_resample,
    run_shardmap_smc,
    sharded_backward_mcmc,
)
