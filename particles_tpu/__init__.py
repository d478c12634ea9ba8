"""particles-tpu: a TPU-native Sequential Monte Carlo framework in JAX.

Built from scratch with the capabilities of nchopin/particles
(``particles/__init__.py:8`` exports ``SMC``, ``FeynmanKac``, ``multiSMC``),
re-designed for TPU: the time loop is ``lax.scan``, particles are vmapped and
shardable across a device mesh, hot kernels are Pallas.
"""

__version__ = "0.1.0"

_CORE_EXPORTS = ("SMC", "SQMC", "FeynmanKac", "multiSMC")

_SUBMODULES = (
    "binary_smc",
    "collectors",
    "core",
    "datasets",
    "distributions",
    "hilbert",
    "hmm",
    "kalman",
    "mcmc",
    "nested",
    "ops",
    "parallel",
    "resampling",
    "rqmc",
    "smc_samplers",
    "smoothing",
    "state_space_models",
    "utils",
    "variance_estimators",
    "variance_mcmc",
)


def __getattr__(name):
    # Lazy: keeps `import particles_tpu.resampling` cheap and avoids import
    # cycles while the package is partially loaded.
    if name in _CORE_EXPORTS:
        from particles_tpu import core

        return getattr(core, name)
    if name in _SUBMODULES:
        import importlib

        return importlib.import_module(f"particles_tpu.{name}")
    raise AttributeError(f"module 'particles_tpu' has no attribute {name!r}")
