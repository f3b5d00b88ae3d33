"""Model state: a flat dict pytree of jnp arrays.

Replaces the ~200-field domain_t object (/root/reference/src/objects/
domain_h.f90:18-363). Which fields exist is decided by the variable
registry's per-scheme requests (registry.collect_requests), mirroring
create_variables (domain_obj.f90:162-433). Static geometry (z, dz,
jacobians, terrain...) lives in grid.Geometry, not in the state.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from ..config import Options
from ..registry import REGISTRY, collect_requests

# fields provided by the static Geometry object rather than the state
GEOMETRY_FIELDS = {
    "z", "z_interface", "dz", "dz_interface", "terrain", "latitude",
    "longitude",
}

State = Dict[str, jnp.ndarray]


def create_state(options: Options, dtype=jnp.float32) -> State:
    """Allocate all requested fields as zeros (create_variables,
    domain_obj.f90:162-433)."""
    req = collect_requests(options)
    d = options.domain
    state: State = {}
    for name in sorted(req.alloc):
        if name in GEOMETRY_FIELDS:
            continue
        spec = REGISTRY[name]
        shape = spec.shape(d.nz, d.ny, d.nx)
        fdtype = dtype  # float64 accumulators handled separately on TPU
        state[name] = jnp.full(shape, spec.default, fdtype)
    return state


def advected_names(options: Options) -> List[str]:
    """Ordered list of advected species (vars_to_advect)."""
    return list(collect_requests(options).advect)


def restart_names(options: Options) -> List[str]:
    return sorted(collect_requests(options).restart)


def to_numpy(state: State) -> Dict[str, np.ndarray]:
    return {k: np.asarray(v) for k, v in state.items()}
