"""icar_tpu — a TPU-native rebuild of the ICAR atmospheric downscaling model.

Brand-new JAX/XLA/Pallas implementation of the capabilities of NCAR/ICAR 2.x
(reference at /root/reference): linear mountain-wave wind downscaling,
finite-volume advection on a terrain-following grid, column physics
(microphysics / PBL / radiation / LSM / convection), boundary forcing
ingest and NetCDF output — designed SPMD-first over a jax.sharding Mesh
rather than translated from the reference's Coarray Fortran.
"""

__version__ = "0.1.0"

from . import constants
