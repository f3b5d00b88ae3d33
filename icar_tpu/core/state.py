"""Model state: a flat dict pytree of jnp arrays.

Replaces the ~200-field domain_t object (/root/reference/src/objects/
domain_h.f90:18-363). Which fields exist is decided by the variable
registry's per-scheme requests (registry.collect_requests), mirroring
create_variables (domain_obj.f90:162-433). Static geometry (z, dz,
jacobians, terrain...) lives in grid.Geometry, not in the state.
"""

from __future__ import annotations

from contextlib import contextmanager
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


def _cpu_device():
    import jax
    try:
        devs = jax.local_devices(backend="cpu")
    except RuntimeError:
        return None
    return devs[0] if devs else None


@contextmanager
def host_setup():
    """Run model-setup math on the host CPU backend.

    Setup (create_state, initial diagnostics, the first wind solve) is a
    storm of ~90 small eager ops. Dispatched to a tunneled TPU each one
    pays a synchronous ~0.4 s compile AND queues an async execution; the
    first jitted step then serializes behind that queue (measured: ~35 s
    client + ~50 s server backlog at ANY domain size). On the local CPU
    the same ops compile in milliseconds. place_on_compute_device() ships
    the finished pytree to the accelerator in one transfer afterwards."""
    import jax
    dev = _cpu_device()
    if dev is None:
        yield None
        return
    with jax.default_device(dev):
        yield dev


def place_on_compute_device(tree, device=None):
    """One bulk transfer of a pytree onto the compute device (the
    counterpart of host_setup). No-op when the session is CPU-only."""
    import jax
    if device is None:
        device = jax.devices()[0]
    if device.platform == "cpu":
        return tree
    return jax.device_put(tree, device)
