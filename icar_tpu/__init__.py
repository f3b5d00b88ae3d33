"""icar_tpu — a TPU-native rebuild of the ICAR atmospheric downscaling model.

Brand-new JAX/XLA/Pallas implementation of the capabilities of NCAR/ICAR 2.x
(reference at /root/reference): linear mountain-wave wind downscaling,
finite-volume advection on a terrain-following grid, column physics
(microphysics / PBL / radiation / LSM / convection), boundary forcing
ingest and NetCDF output — designed SPMD-first over a jax.sharding Mesh
rather than translated from the reference's Coarray Fortran.
"""

__version__ = "0.1.0"


def _setup_compilation_cache():
    """Point JAX at a persistent on-disk compilation cache.

    The fullphys while_loop takes ~10 min to compile at CONUS-scale
    domains; the reference has no analogous cost (Fortran compiles once at
    build time), so a persistent XLA cache is the TPU-native equivalent of
    "compile the binary once".  Override the location with
    ICAR_TPU_XLA_CACHE=<dir>; set it to an empty string to disable.
    """
    import os

    path = os.environ.get(
        "ICAR_TPU_XLA_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "icar_tpu", "xla"))
    if not path:
        return
    try:
        import jax

        # CPU-only sessions (tests, virtual-device dryruns) skip the cache:
        # XLA:CPU AOT reloads warn about machine-feature mismatches, and CPU
        # compiles are cheap anyway.  TPU programs are what take ~10 min.
        plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
        if plats and set(plats.split(",")) <= {"cpu"}:
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax or read-only filesystem: run without the cache


_setup_compilation_cache()

from . import constants
