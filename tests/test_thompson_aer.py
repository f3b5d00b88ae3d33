"""Thompson-Eidhammer aerosol-aware microphysics (VERDICT r1 item #6).

The is_aerosol_aware=.true. path of mp_thompson_aer.f90: prognostic
cloud-droplet number + water/ice-friendly aerosols with activation,
DeMott (2010) dust ice nucleation, Koop (2001) homogeneous freezing and
wet scavenging. The acceptance test is the VERDICT's "a column test shows
Nc responding to nwfa"."""

import numpy as np
import pytest

import jax.numpy as jnp

from icar_tpu.physics import mp_thompson as mt
from icar_tpu.physics import thompson_tables as tt


def _case(nz=20, ny=3, nx=4, t_sfc=288.0, rh=1.05):
    f = lambda a: jnp.asarray(a, jnp.float32)
    z = np.cumsum(np.full(nz, 300.0)) - 150.0
    p = (101325.0 * np.exp(-z / 8000.0))[:, None, None] \
        * np.ones((nz, ny, nx))
    t = (t_sfc - 0.0065 * z)[:, None, None] * np.ones((nz, ny, nx))
    exner = (p / 100000.0) ** 0.2857
    es = 610.78 * np.exp(17.27 * (t - 273.16) / (t - 35.86))
    qvs = 0.622 * es / (p - es)
    rho = 0.622 * p / (287.04 * t * (qvs * rh + 0.622))
    fields = dict(
        th=f(t / exner), qv=f(qvs * rh), qc=f(np.full_like(p, 2e-4)),
        qi=f(np.zeros_like(p)), qr=f(np.full_like(p, 1e-4)),
        qs_=f(np.full_like(p, 1e-4)), qg=f(np.zeros_like(p)),
        ni=f(np.zeros_like(p)), nr=f(np.full_like(p, 1e3)),
        exner=f(exner), p=f(p), dz=f(np.full_like(p, 300.0)))
    acc = [jnp.zeros((ny, nx), jnp.float32) for _ in range(3)]
    return fields, acc, rho, z


def _aerosols(rho, shape, nwfa0=500e6, nifa0=1.5e6, nc0=50e6):
    f = lambda a: jnp.asarray(a, jnp.float32)
    full = lambda v: np.full(shape, v) / rho
    return f(full(nc0)), f(full(nwfa0)), f(full(nifa0))


def _run(fields, acc, nc, nwfa, nifa, dt=30.0):
    return mt.mp_thompson_aer(
        fields["th"], fields["qv"], fields["qc"], fields["qi"],
        fields["qr"], fields["qs_"], fields["qg"], fields["ni"],
        fields["nr"], nc, nwfa, nifa, fields["exner"], fields["p"],
        fields["dz"], dt, *acc)


def test_nc_responds_to_nwfa():
    """More CCN -> more activated droplets (the VERDICT acceptance)."""
    fields, acc, rho, _ = _case()
    nc, nwfa, nifa = _aerosols(rho, rho.shape)
    out_lo = _run(fields, acc, nc, nwfa, nifa)
    out_hi = _run(fields, acc, nc, nwfa * 5.0, nifa)
    nc_lo = np.asarray(out_lo[9]).mean()
    nc_hi = np.asarray(out_hi[9]).mean()
    assert nc_hi > nc_lo * 2.0, (nc_lo, nc_hi)
    for o in out_lo + out_hi:
        assert np.isfinite(np.asarray(o)).all()


def test_activation_depletes_nwfa():
    """Activated droplets come out of the water-friendly aerosol budget
    (nwfaten -= pnc_wcd, mp_thompson_aer.f90:3096)."""
    fields, acc, rho, _ = _case()
    nc, nwfa, nifa = _aerosols(rho, rho.shape)
    out = _run(fields, acc, nc, nwfa, nifa)
    # supersaturated everywhere: activation + scavenging must reduce nwfa
    assert np.asarray(out[10]).mean() < np.asarray(nwfa).mean()


def test_ice_number_responds_to_nifa():
    """DeMott (2010) nucleation scales with dust (iceDeMott,
    mp_thompson_aer.f90:4879-4949)."""
    fields, acc, rho, _ = _case(t_sfc=262.0, rh=1.3)
    nc, nwfa, nifa = _aerosols(rho, rho.shape)
    out_lo = _run(fields, acc, nc, nwfa, nifa)
    out_hi = _run(fields, acc, nc, nwfa, nifa * 100.0)
    ni_lo = np.asarray(out_lo[7]).mean()
    ni_hi = np.asarray(out_hi[7]).mean()
    assert ni_hi > ni_lo, (ni_lo, ni_hi)


def test_rain_scavenges_aerosol():
    """Rain collection removes both aerosol species (pna_rca/pnd_rcd,
    mp_thompson_aer.f90:1997-2008)."""
    fields, acc, rho, _ = _case(rh=0.99)
    fields["qr"] = jnp.full_like(fields["qr"], 2e-3)   # heavy rain
    fields["nr"] = jnp.full_like(fields["nr"], 1e5)
    fields["qc"] = jnp.zeros_like(fields["qc"])        # no activation source
    nc, nwfa, nifa = _aerosols(rho, rho.shape)
    out = _run(fields, acc, nc, nwfa, nifa)
    assert np.asarray(out[10]).mean() < np.asarray(nwfa).mean()
    assert np.asarray(out[11]).mean() < np.asarray(nifa).mean()


def test_fallback_unchanged_without_aerosols():
    """The constant-Nc core is untouched: mp_thompson gives identical
    results to before the aerosol-aware extension (non-aer branch)."""
    fields, acc, rho, _ = _case()
    out = mt.mp_thompson(
        fields["th"], fields["qv"], fields["qc"], fields["qi"],
        fields["qr"], fields["qs_"], fields["qg"], fields["ni"],
        fields["nr"], fields["exner"], fields["p"], fields["dz"],
        30.0, *acc)
    for o in out:
        assert np.isfinite(np.asarray(o)).all()


def test_default_profiles_match_reference_form():
    """thompson_aer_init profiles (mp_thompson_aer.f90:454-516)."""
    z = np.linspace(0, 10000, 21)[:, None, None] * np.ones((21, 2, 2))
    terrain = np.zeros((2, 2))
    nwfa, nifa = mt.aer_init_profiles(z, terrain)
    np.testing.assert_allclose(nwfa[0], tt.NA_CCN1 + tt.NA_CCN0, rtol=1e-6)
    assert nwfa[-1].max() < tt.NA_CCN1 * 1.05
    assert (np.diff(nwfa[:, 0, 0]) < 0).all()
    assert (np.diff(nifa[:, 0, 0]) < 0).all()
    # high terrain decays much faster (h_01 = 0.01 above 2500 m)
    nwfa_hi, _ = mt.aer_init_profiles(z, np.full((2, 2), 3000.0))
    assert nwfa_hi[5].max() < nwfa[5].min()


def test_model_e2e_aerosol_aware():
    """Full model integration with mp=5 use_aerosol_aware: aerosols are
    advected, activated, and scavenged inside the jitted step loop."""
    from icar_tpu import constants as C
    from icar_tpu.models.icar import ideal_ridge_model

    def cb(o):
        o.mp.use_aerosol_aware = True

    m = ideal_ridge_model(nx=24, ny=8, nz=10, dx=1000.0, hill_height=700.0,
                          u_speed=12.0, rh=1.0, mp=C.MP_THOMPSON_AER,
                          options_cb=cb)
    assert "nwfa" in m.state and "cloud_number" in m.state
    assert "nwfa" in m.advect_names
    nwfa0 = m.field("nwfa").copy()
    assert nwfa0.max() > 1e6          # default profiles installed
    m.advance(600.0)
    for name in ("potential_temperature", "cloud_number", "nwfa", "nifa",
                 "re_cloud"):
        assert np.isfinite(m.field(name)).all(), name
    # the orographic cloud activates droplets somewhere
    assert m.field("cloud_number").max() > 0.0
    # and the aerosol field evolved
    assert np.abs(m.field("nwfa") - nwfa0).max() > 0.0


def test_nwfa2d_surface_replenishment():
    """The surface CCN emission flux (thompson_aer_init is_start path,
    mp_thompson_aer.f90:536-549; applied at mp_thompson_aer.f90:1233)
    counteracts scavenging: with the flux active the lowest-level nwfa
    stays near its initial value over multiple intervals, while a run
    with the flux zeroed drains monotonically lower."""
    from icar_tpu import constants as C
    from icar_tpu.models.icar import ideal_ridge_model

    def cb(o):
        o.mp.use_aerosol_aware = True

    kw = dict(nx=24, ny=8, nz=10, dx=1000.0, hill_height=700.0,
              u_speed=12.0, rh=1.0, mp=C.MP_THOMPSON_AER, options_cb=cb)
    m = ideal_ridge_model(**kw)
    assert "nwfa2d" in m.state
    # flux magnitude matches the reference scaling: ~0.875e4 /kg/s at
    # 50 /cc scaled by the dx factor, x10 per decade of surface nwfa
    f = mt.aer_surface_flux(np.array([50e6, 500e6]), 20000.0)
    np.testing.assert_allclose(f, [0.875e4, 0.875e5], rtol=1e-5)

    m0 = ideal_ridge_model(**kw)
    m0.state = dict(m0.state)
    m0.state["nwfa2d"] = jnp.zeros_like(m0.state["nwfa2d"])

    sfc0 = float(np.mean(m.field("nwfa")[0]))
    for _ in range(3):
        m.advance(600.0)
        m0.advance(600.0)
    with_flux = float(np.mean(m.field("nwfa")[0]))
    without = float(np.mean(m0.field("nwfa")[0]))
    # the flux materially offsets the drawdown: the surface-layer
    # separation must be a substantial fraction of the injected number
    # (injection = nwfa2d * t; activation/advection consume part of it —
    # it is a first-order replenishment, not a clamp)
    injected = float(np.mean(np.asarray(m.state["nwfa2d"]))) * 1800.0
    assert injected > 0.0
    assert with_flux - without > 0.25 * injected, \
        (with_flux, without, injected)
