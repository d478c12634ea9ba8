"""Multi-chip execution: particle-axis and run-axis sharding over a Mesh."""

from particles_tpu.parallel.sharded import (  # noqa: F401
    make_mesh,
    particle_constrain,
    run_sharded_smc,
    run_sharded_multismc,
)
