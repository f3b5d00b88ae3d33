"""SB04 simple microphysics tests (mirrors src/tests/test_mp_simple.f90 and
adds conservation / phase checks)."""

import jax.numpy as jnp
import numpy as np
import pytest

from icar_tpu import constants as C
from icar_tpu.physics.mp_simple import (
    cloud_conversion, mp_simple, phase_change, sat_mr,
)


def column_setup(nz=20, ny=4, nx=4, t_surface=290.0, rh=0.5):
    """A hydrostatic-ish idealized column."""
    dz = np.full((nz, ny, nx), 500.0, np.float32)
    zm = np.cumsum(dz, axis=0) - 250.0
    p = (100000.0 * np.exp(-zm / 8000.0)).astype(np.float32)
    t = (t_surface - 0.0065 * zm).astype(np.float32)
    exner = (p / 100000.0) ** (C.RD / C.CP)
    theta = t / exner
    rho = p / (C.RD * t)
    qvsat = np.asarray(sat_mr(jnp.asarray(t), jnp.asarray(p)))
    qv = (rh * qvsat).astype(np.float32)
    zeros = np.zeros_like(qv)
    return dict(pressure=jnp.asarray(p), theta=jnp.asarray(theta),
                exner=jnp.asarray(exner), rho=jnp.asarray(rho),
                qv=jnp.asarray(qv), qc=jnp.asarray(zeros),
                qr=jnp.asarray(zeros), qs=jnp.asarray(zeros),
                dz=jnp.asarray(dz), t=t, qvsat=qvsat)


def test_sat_mr_magnitudes():
    # ~22 g/kg at 300K/1000hPa; decreases rapidly with temperature
    v300 = float(sat_mr(jnp.float32(300.0), jnp.float32(1e5)))
    v270 = float(sat_mr(jnp.float32(270.0), jnp.float32(1e5)))
    assert 0.020 < v300 < 0.026
    assert 0.002 < v270 < 0.004
    assert v270 < v300


def test_cloud_conversion_condenses_supersaturation():
    p = jnp.full((10,), 9e4, jnp.float32)
    t = jnp.full((10,), 280.0, jnp.float32)
    qvs = sat_mr(t, p)
    qv = qvs * 1.3
    qc = jnp.zeros_like(qv)
    t2, qv2, qc2, qvsat = cloud_conversion(p, t, qv, qc, 10.0)
    # vapor reduced toward (new, warmer) saturation; cloud formed; heated
    assert float(qc2.min()) > 0
    assert float(t2.min()) > 280.0
    np.testing.assert_allclose(np.asarray(qv2), np.asarray(sat_mr(t2, p)),
                               rtol=2e-2)
    # water conserved
    np.testing.assert_allclose(np.asarray(qv2 + qc2), np.asarray(qv + qc),
                               rtol=1e-6)


def test_cloud_conversion_evaporates_cloud():
    p = jnp.full((4,), 9e4, jnp.float32)
    t = jnp.full((4,), 280.0, jnp.float32)
    qv = sat_mr(t, p) * 0.5
    qc = jnp.full((4,), 1e-4, jnp.float32)
    t2, qv2, qc2, _ = cloud_conversion(p, t, qv, qc, 10.0)
    # small cloud fully evaporates in subsaturated air, cooling it
    np.testing.assert_allclose(np.asarray(qc2), 0.0, atol=1e-7)
    assert float(t2.max()) < 280.0
    np.testing.assert_allclose(np.asarray(qv2), np.asarray(qv + qc), rtol=1e-6)


def test_phase_change_bounded():
    t = jnp.float32(280.0)
    t2, q1, q2 = phase_change(t, jnp.float32(1e-3), jnp.float32(5e-4),
                              jnp.float32(0.0), -2.26e6, jnp.float32(0.9))
    # transfer limited by 0.99*(qmax-q2)
    assert float(q2) <= 5e-4 * 0.99 + 1e-9
    assert float(q1) >= 0


def test_mp_simple_rains_out_supersaturated_column():
    s = column_setup(rh=1.3, t_surface=295.0)
    rain = jnp.zeros((4, 4), jnp.float32)
    snow = jnp.zeros((4, 4), jnp.float32)
    theta, qv, qc, qr, qs = s["theta"], s["qv"], s["qc"], s["qr"], s["qs"]
    for _ in range(30):
        theta, qv, qc, qr, qs, rain, snow = mp_simple(
            s["pressure"], theta, s["exner"], s["rho"], qv, qc, qr, qs,
            rain, snow, 60.0, s["dz"])
    assert float(rain.min()) > 0.0          # precipitation reached the ground
    assert float(qv.min()) >= 0
    assert float(qc.min()) >= 0 and float(qr.min()) >= 0
    # cold upper levels produce snow -> some snowfall too
    assert float(snow.min()) >= 0.0


def test_mp_simple_water_conservation():
    # NOTE: mild supersaturation at cool temperatures. At warm temperatures
    # the reference's 0.5-damped saturation iteration diverges, hits the
    # 15-iteration cap and reverts by *destroying* supersaturation
    # (mp_simple.f90:248-255) — behavior we reproduce for parity, but which
    # breaks water conservation, so the test avoids that regime.
    s = column_setup(rh=1.05, t_surface=280.0)
    rain = jnp.zeros((4, 4), jnp.float32)
    snow = jnp.zeros((4, 4), jnp.float32)
    theta, qv, qc, qr, qs = s["theta"], s["qv"], s["qc"], s["qr"], s["qs"]

    def column_water(qv, qc, qr, qs, rain):
        m = jnp.sum((qv + qc + qr + qs) * s["rho"] * s["dz"], axis=0)
        return m + rain  # rain already in kg/m^2

    w0 = np.asarray(column_water(qv, qc, qr, qs, rain))
    for _ in range(10):
        theta, qv, qc, qr, qs, rain, snow = mp_simple(
            s["pressure"], theta, s["exner"], s["rho"], qv, qc, qr, qs,
            rain, snow, 120.0, s["dz"])
    w1 = np.asarray(column_water(qv, qc, qr, qs, rain))
    np.testing.assert_allclose(w1, w0, rtol=5e-4)


def test_mp_simple_dry_column_noop():
    s = column_setup(rh=0.3)
    rain = jnp.zeros((4, 4), jnp.float32)
    snow = jnp.zeros((4, 4), jnp.float32)
    theta, qv, qc, qr, qs, rain, snow = mp_simple(
        s["pressure"], s["theta"], s["exner"], s["rho"], s["qv"], s["qc"],
        s["qr"], s["qs"], rain, snow, 60.0, s["dz"])
    np.testing.assert_allclose(np.asarray(rain), 0.0)
    np.testing.assert_allclose(np.asarray(theta), np.asarray(s["theta"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(qv), np.asarray(s["qv"]), rtol=1e-6)
