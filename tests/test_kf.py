"""Kain-Fritsch convection tests (trigger behavior, moisture budget,
NCA persistence, end-to-end model run)."""

import jax.numpy as jnp
import numpy as np

from icar_tpu import constants as C
from icar_tpu.models.icar import ideal_ridge_model
from icar_tpu.physics import cu_kf


def sounding(nz=24, ny=2, nx=2, t_sfc=302.0, lapse=0.0075, rh_low=0.92,
             rh_high=0.45, w=0.6):
    dz = np.full((nz, ny, nx), 450.0, np.float32)
    z = np.cumsum(dz, 0) - 225.0
    p = (1e5 * np.exp(-z / 8200.0)).astype(np.float32)
    t = np.maximum(t_sfc - lapse * z, 210.0).astype(np.float32)
    es = 611.2 * np.exp(17.67 * (t - 273.15) / (t - 29.65))
    qs = 0.622 * es / (p - es)
    rh = np.where(z < 2500, rh_low, rh_high).astype(np.float32)
    qv = (rh * qs).astype(np.float32)
    rho = (p / (287.058 * t * (1 + 0.608 * qv))).astype(np.float32)
    u = np.full_like(t, 5.0)
    v = np.zeros_like(t)
    w0avg = np.where(z < 4000, w, 0.1).astype(np.float32)
    return [jnp.asarray(a) for a in (u, v, t, qv, p, rho, dz, w0avg)]


def test_unstable_sounding_triggers():
    out = cu_kf._kf_columns(*sounding(), 90.0, 4000.0)
    assert bool(np.asarray(out["triggered"]).all())
    assert float(np.asarray(out["pratec"]).min()) > 0.0
    assert float(np.asarray(out["nca"]).min()) > 0.0
    # convection warms the column net (latent heat release)
    assert float(np.asarray(out["dtdt"]).max()) > 0.0
    for k in ("dtdt", "dqdt", "dqcdt", "dqrdt", "dqidt", "dqsdt"):
        assert np.isfinite(np.asarray(out[k])).all(), k


def test_column_water_budget_closes():
    args = sounding()
    out = cu_kf._kf_columns(*args, 90.0, 4000.0)
    rho, dz = np.asarray(args[5]), np.asarray(args[6])
    tot = np.asarray((out["dqdt"] + out["dqcdt"] + out["dqidt"]
                      + out["dqrdt"] + out["dqsdt"])) * rho * dz
    colsum = tot.sum(axis=0)
    pr = np.asarray(out["pratec"])
    # evaporation/condensation redistribute; the only column sink is rain
    np.testing.assert_allclose(colsum, -pr, rtol=5e-3, atol=1e-8)


def test_stable_sounding_no_trigger():
    out = cu_kf._kf_columns(
        *sounding(t_sfc=285.0, lapse=0.0045, rh_low=0.4, rh_high=0.3,
                  w=-0.05), 90.0, 4000.0)
    assert not bool(np.asarray(out["triggered"]).any())
    assert float(np.abs(np.asarray(out["dtdt"])).max()) == 0.0
    assert float(np.asarray(out["pratec"]).max()) == 0.0


def test_nca_freezes_tendencies():
    args = sounding()
    u, v, t, qv, p, rho, dz, w0avg = args
    th = t  # exner=1 proxy: pass exner=ones
    exner = jnp.ones_like(t)
    z2 = jnp.zeros(t.shape[1:], jnp.float32)
    z3 = jnp.zeros_like(t)
    nca = jnp.full(t.shape[1:], -100.0, jnp.float32)
    w_real = jnp.asarray(np.full(t.shape, 0.6, np.float32))
    outs = cu_kf.kfcps(u, v, th, qv, p, rho, dz, w_real, exner, 90.0,
                       4000.0, z3, nca, z2, z3, z3, z3, z3, z3, z3)
    (t_th, t_qv, *_rest, raincv, w0avg_n, nca_n, prate_n) = outs
    assert float(np.asarray(prate_n).min()) > 0.0
    assert float(np.asarray(nca_n).min()) > 0.0
    # second call while NCA active: tendencies unchanged even though the
    # sounding is perturbed
    outs2 = cu_kf.kfcps(u, v, th + 5.0, qv, p, rho, dz, w_real, exner,
                        90.0, 4000.0, w0avg_n, nca_n, prate_n, t_th, t_qv,
                        _rest[0], _rest[1], _rest[2], _rest[3])
    np.testing.assert_allclose(np.asarray(outs2[0]), np.asarray(t_th))
    np.testing.assert_allclose(np.asarray(outs2[9]), np.asarray(prate_n))
    # NCA counts down
    assert float(np.asarray(outs2[8]).max()) \
        < float(np.asarray(nca_n).max())


def test_model_runs_with_kf():
    m = ideal_ridge_model(nx=48, ny=12, nz=12, dx=2000.0, hill_height=600.0,
                          u_speed=10.0, rh=1.0, mp=C.MP_WSM3,
                          conv=C.CU_KF)
    m.advance(1200.0)
    for n in ("potential_temperature", "water_vapor",
              "convective_precipitation", "precipitation", "kf_nca",
              "kf_w0avg"):
        assert np.isfinite(m.field(n)).all(), n
    th = m.field("potential_temperature")
    assert 250 < th.min() and th.max() < 600
