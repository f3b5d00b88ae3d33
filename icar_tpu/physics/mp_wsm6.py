"""WSM6 6-class graupel microphysics (Hong & Lim 2006).

JAX re-implementation of /root/reference/src/physics/mp_wsm6.f90: vapor,
cloud water, cloud ice, rain, snow and graupel, with the full WSM process
set — warm rain (autoconversion/accretion/evaporation), the HDC ice
processes (nucleation, deposition, aggregation), snow/graupel accretion
and conversion, Biggs freezing of cloud water and rain, melting and
enhanced melting, and evaporation of melting snow/graupel. Sequential
``ifsat`` saturation ordering is preserved as cumulative masks; the
category-dependent conservation scaling keeps every sink bounded by its
source.

As in the WSM3 port, sedimentation is CFL-substepped upwind transport with
the scheme's terminal velocities (snow+graupel share the mass-weighted
velocity, matching nislfv_rain_plm6's joint remap) instead of the
semi-Lagrangian PLM remap — a documented divergence.

Layout (z, y, x); level 0 is the surface layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from math import gamma as _gamma

from .mp_wsm3 import (CICE, CLIQ, CPD, CPV, DEN0, DENR, EP1, EP2, G, PSAT,
                      QMIN, RD, RV, T0C, XLF0, XLS, XLV0, _saturation,
                      _sediment)

# scheme parameters (mp_wsm6.f90:16-43)
N0R = 8e6
N0G = 4e6
AVTR, BVTR = 841.9, 0.8
R0 = 0.8e-5
PEAUT = 0.55
XNCR = 3e8
XMYU = 1.718e-5
AVTS, BVTS = 11.72, 0.41
AVTG, BVTG = 330.0, 0.8
DENG = 500.0
N0SMAX = 1e11
LAMDARMAX, LAMDASMAX, LAMDAGMAX = 8e4, 1e5, 6e4
DICON = 11.9
DIMAX = 500e-6
N0S = 2e6
ALPHA = 0.12
PFRZ1, PFRZ2 = 100.0, 0.66
QCRMIN = 1e-9
EACRC = 1.0
DENS = 100.0
QS0 = 6e-4

PI = np.pi
XLV1 = CLIQ - CPV

QC0 = 4.0 / 3.0 * PI * DENR * R0 ** 3 * XNCR / DEN0
QCK1 = 0.104 * 9.8 * PEAUT / (XNCR * DENR) ** (1.0 / 3.0) / XMYU \
    * DEN0 ** (4.0 / 3.0)
G3PBR = _gamma(3 + BVTR)
G4PBR = _gamma(4 + BVTR)
G5PBRO2 = _gamma(2.5 + 0.5 * BVTR)
G6PBR = _gamma(6 + BVTR)
PVTR = AVTR * G4PBR / 6.0
PACRR = PI * N0R * AVTR * G3PBR * 0.25
PRECR1 = 2.0 * PI * N0R * 0.78
PRECR2 = 2.0 * PI * N0R * 0.31 * AVTR ** 0.5 * G5PBRO2
ROQIMAX = 2.08e22 * DIMAX ** 8
G3PBS = _gamma(3 + BVTS)
G4PBS = _gamma(4 + BVTS)
G5PBSO2 = _gamma(2.5 + 0.5 * BVTS)
PVTS = AVTS * G4PBS / 6.0
PACRS = PI * N0S * AVTS * G3PBS * 0.25
PRECS1 = 4.0 * N0S * 0.65
PRECS2 = 4.0 * N0S * 0.44 * AVTS ** 0.5 * G5PBSO2
PACRC = PI * N0S * AVTS * G3PBS * 0.25 * EACRC
G3PBG = _gamma(3 + BVTG)
G4PBG = _gamma(4 + BVTG)
G5PBGO2 = _gamma(2.5 + 0.5 * BVTG)
PVTG = AVTG * G4PBG / 6.0
PACRG = PI * N0G * AVTG * G3PBG * 0.25
PRECG1 = 2.0 * PI * N0G * 0.78
PRECG2 = 2.0 * PI * N0G * 0.31 * AVTG ** 0.5 * G5PBGO2
PIDN0R = PI * DENR * N0R
PIDN0S = PI * DENS * N0S
PIDN0G = PI * DENG * N0G
RSLOPERMAX = 1.0 / LAMDARMAX
RSLOPESMAX = 1.0 / LAMDASMAX
RSLOPEGMAX = 1.0 / LAMDAGMAX


def _slope_one(q, pidn0, rmax, bvt, pvt, denfac, den, n0fac=None):
    pid = pidn0 * (n0fac if n0fac is not None else 1.0)
    lam = (pid / (jnp.maximum(q, QCRMIN) * den)) ** 0.25
    rs = jnp.where(q <= QCRMIN, rmax, 1.0 / lam)
    rsb = rs ** bvt
    vt = jnp.where(q <= 0.0, 0.0, pvt * rsb * denfac)
    return rs, rsb, rs * rs, rs * rs * rs, vt


def _slopes6(qr, qs_, qg, den, denfac, t):
    """Slope parameters + terminal velocities for rain/snow/graupel
    (slope_wsm6, mp_wsm6.f90:1508-1583)."""
    n0sfac = jnp.clip(jnp.exp(ALPHA * (T0C - t)), 1.0, N0SMAX / N0S)
    r = _slope_one(qr, PIDN0R, RSLOPERMAX, BVTR, PVTR, denfac, den)
    s = _slope_one(qs_, PIDN0S, RSLOPESMAX, BVTS, PVTS, denfac, den, n0sfac)
    g = _slope_one(qg, PIDN0G, RSLOPEGMAX, BVTG, PVTG, denfac, den)
    return r, s, g, n0sfac


def _diffus(x, y):
    return 8.794e-5 * x ** 1.81 / y


def _viscos(x, y):
    return 1.496e-6 * (x * jnp.sqrt(x)) / (x + 120.0) / y


def _xka(x, y):
    return 1.414e3 * _viscos(x, y) * y


def _diffac(a, b, c, d, e):
    return d * a * a / (_xka(c, d) * RV * c * c) + 1.0 / (e * _diffus(c, b))


def _venfac(a, b, c):
    return (_viscos(b, c) / _diffus(b, a)) ** (1.0 / 3.0) \
        / jnp.sqrt(_viscos(b, c)) * jnp.sqrt(jnp.sqrt(DEN0 / c))


def _scale(value, source_terms, dtcld):
    """Conservation scaling: shrink all listed rates when their net sink
    exceeds the available mass (mp_wsm6.f90:1140+)."""
    source = sum(source_terms) * dtcld
    factor = jnp.where(source > value,
                       value / jnp.where(source == 0, 1.0, source), 1.0)
    return factor


def wsm6(th, qv, qc, qi, qr, qs_, qg, exner, p, dz, den, dt,
         rain, snow, graupel):
    """One WSM6 step (wsm62D, mp_wsm6.f90:185-1384). dt is capped at 120 s
    by the model, so one minor loop suffices.

    Returns (th, qv, qc, qi, qr, qs, qg, rain, snow, graupel)."""
    t = th * exner
    dtcld = dt
    q = qv

    qc = jnp.maximum(qc, 0.0)
    qi = jnp.maximum(qi, 0.0)
    qr = jnp.maximum(qr, 0.0)
    qs_ = jnp.maximum(qs_, 0.0)
    qg = jnp.maximum(qg, 0.0)

    cpm = CPD * (1.0 - jnp.maximum(q, QMIN)) + jnp.maximum(q, QMIN) * CPV
    xl = XLV0 - XLV1 * (t - T0C)
    denfac = jnp.sqrt(DEN0 / den)

    qsat_i, _ = _saturation(t, p)        # ice-mixed saturation
    # water saturation (always wrt liquid)
    ttp = T0C + 0.01
    tr = ttp / t
    xa = -(CPV - CLIQ) / RV
    xb = xa + XLV0 / (RV * ttp)
    es_w = jnp.minimum(PSAT * tr ** xa * jnp.exp(xb * (1.0 - tr)), 0.99 * p)
    qsat_w = jnp.maximum(EP2 * es_w / (p - es_w), QMIN)
    rh_w = jnp.maximum(q / qsat_w, QMIN)
    rh_i = jnp.maximum(q / qsat_i, QMIN)

    xni = jnp.clip(5.38e7 * (den * jnp.maximum(qi, QMIN)) ** 0.75, 1e3, 1e6)

    # ---- sedimentation (joint snow+graupel velocity; mp_wsm6.f90:570-610)
    r_sl, s_sl, g_sl, n0sfac = _slopes6(qr, qs_, qg, den, denfac, t)
    vt_r = r_sl[4]
    qsum = jnp.maximum(qs_ + qg, 1e-15)
    vt_sg = jnp.where(qsum > 1e-15,
                      (s_sl[4] * qs_ + g_sl[4] * qg) / qsum, 0.0)
    qr, sfc_r, _ = _sediment(qr, vt_r, den, dz, dtcld)
    qs_, sfc_s, _ = _sediment(qs_, vt_sg, den, dz, dtcld)
    qg, sfc_g, _ = _sediment(qg, vt_sg, den, dz, dtcld)

    # ---- melting of falling snow/graupel (psmlt/pgmlt, :625-660)
    r_sl, s_sl, g_sl, n0sfac = _slopes6(qr, qs_, qg, den, denfac, t)
    warm = t > T0C
    work2v = _venfac(p, t, den)
    coeres_s = s_sl[2] * jnp.sqrt(s_sl[0] * s_sl[1])
    psmlt = _xka(t, den) / XLF0 * (T0C - t) * PI / 2.0 * n0sfac \
        * (PRECS1 * s_sl[2] + PRECS2 * work2v * coeres_s)
    psmlt = jnp.where(warm & (qs_ > 0),
                      jnp.clip(psmlt * dtcld, -qs_, 0.0), 0.0)
    qs_ = qs_ + psmlt
    qr = qr - psmlt
    t = t + XLF0 / cpm * psmlt
    coeres_g = g_sl[2] * jnp.sqrt(g_sl[0] * g_sl[1])
    pgmlt = _xka(t, den) / XLF0 * (T0C - t) \
        * (PRECG1 * g_sl[2] + PRECG2 * work2v * coeres_g)
    pgmlt = jnp.where(warm & (qg > 0),
                      jnp.clip(pgmlt * dtcld, -qg, 0.0), 0.0)
    qg = qg + pgmlt
    qr = qr - pgmlt
    t = t + XLF0 / cpm * pgmlt

    # ---- cloud ice sedimentation (:662-690)
    xmi = den * qi / xni
    diam_i = jnp.clip(DICON * jnp.sqrt(jnp.maximum(xmi, 0.0)), 1e-25, DIMAX)
    vt_i = jnp.where(qi > 0.0, 1.49e4 * diam_i ** 1.31, 0.0)
    qi, sfc_i, _ = _sediment(qi, vt_i, den, dz, dtcld)

    # ---- surface precipitation (:698-720); fluxes already in kg/m^2 = mm
    rain = rain + sfc_r + sfc_s + sfc_g + sfc_i
    snow = snow + sfc_s + sfc_i
    graupel = graupel + sfc_g

    # ---- instantaneous conversions (:723-778)
    supcol = T0C - t
    xlf_i = jnp.where(supcol < 0, XLF0, XLS - xl)
    # pimlt: melt all cloud ice above 0C
    m = (supcol < 0) & (qi > 0)
    qc = jnp.where(m, qc + qi, qc)
    t = jnp.where(m, t - xlf_i / cpm * qi, t)
    qi = jnp.where(m, 0.0, qi)
    # pihmf: homogeneous freezing below -40C
    m = (supcol > 40) & (qc > 0)
    qi = jnp.where(m, qi + qc, qi)
    t = jnp.where(m, t + xlf_i / cpm * qc, t)
    qc = jnp.where(m, 0.0, qc)
    # pihtf: Biggs heterogeneous freezing of cloud water
    supcolt = jnp.minimum(supcol, 50.0)
    pfrzdtc = jnp.minimum(
        PFRZ1 * (jnp.exp(PFRZ2 * supcolt) - 1.0) * den / DENR / XNCR
        * qc * qc * dtcld, qc)
    m = (supcol > 0) & (qc > QMIN)
    qi = jnp.where(m, qi + pfrzdtc, qi)
    t = jnp.where(m, t + xlf_i / cpm * pfrzdtc, t)
    qc = jnp.where(m, qc - pfrzdtc, qc)
    # pgfrz: Biggs freezing of rain to graupel
    r_sl, s_sl, g_sl, n0sfac = _slopes6(qr, qs_, qg, den, denfac, t)
    temp_r = r_sl[3] * r_sl[3] * r_sl[0]
    pfrzdtr = jnp.minimum(
        20.0 * PI * PI * PFRZ1 * N0R * DENR / den
        * (jnp.exp(PFRZ2 * supcolt) - 1.0) * temp_r * dtcld, qr)
    m = (supcol > 0) & (qr > 0)
    qg = jnp.where(m, qg + pfrzdtr, qg)
    t = jnp.where(m, t + xlf_i / cpm * pfrzdtr, t)
    qr = jnp.where(m, qr - pfrzdtr, qr)

    # ---- process rates (:780-1130)
    r_sl, s_sl, g_sl, n0sfac = _slopes6(qr, qs_, qg, den, denfac, t)
    rsl, rslb, rsl2, rsl3, _ = r_sl
    ssl, sslb, ssl2, ssl3, _ = s_sl
    gsl, gslb, gsl2, gsl3, _ = g_sl
    supcol = T0C - t
    work1_w = _diffac(xl, p, t, den, qsat_w)
    work1_i = _diffac(XLS, p, t, den, qsat_i)
    work2v = _venfac(p, t, den)
    zero = jnp.zeros_like(t)

    supsat_w = jnp.maximum(q, QMIN) - qsat_w
    satdt_w = supsat_w / dtcld
    # warm rain
    praut = jnp.where(qc > QC0,
                      jnp.minimum(QCK1 * qc ** (7.0 / 3.0), qc / dtcld), 0.0)
    pracw = jnp.where((qr > QCRMIN) & (qc > QMIN),
                      jnp.minimum(PACRR * rsl3 * rslb * qc * denfac,
                                  qc / dtcld), 0.0)
    coeres_r = rsl2 * jnp.sqrt(rsl * rslb)
    prevp_raw = (rh_w - 1.0) * (PRECR1 * rsl2
                                + PRECR2 * work2v * coeres_r) / work1_w
    prevp = jnp.where(qr > 0,
                      jnp.where(prevp_raw < 0,
                                jnp.maximum(jnp.maximum(prevp_raw,
                                                        -qr / dtcld),
                                            satdt_w / 2),
                                jnp.minimum(prevp_raw, satdt_w / 2)), 0.0)

    # cold processes
    supsat_i = jnp.maximum(q, QMIN) - qsat_i
    satdt = supsat_i / dtcld
    eacrs = jnp.exp(0.07 * (-supcol))
    xni = jnp.clip(5.38e7 * (den * jnp.maximum(qi, QMIN)) ** 0.75, 1e3, 1e6)
    xmi = den * qi / xni
    diameter = jnp.minimum(DICON * jnp.sqrt(jnp.maximum(xmi, 0.0)), DIMAX)
    vt2i = 1.49e4 * jnp.maximum(diameter, 1e-25) ** 1.31
    vt2r = PVTR * rslb * denfac
    vt2s = PVTS * sslb * denfac
    vt2g = PVTG * gslb * denfac
    qsum = jnp.maximum(qs_ + qg, 1e-15)
    vt2ave = jnp.where(qsum > 1e-15, (vt2s * qs_ + vt2g * qg) / qsum, 0.0)

    cold_i = (supcol > 0) & (qi > QMIN)
    acr_r = 2.0 * rsl3 + 2.0 * diameter * rsl2 + diameter ** 2 * rsl
    praci = jnp.where(cold_i & (qr > QCRMIN),
                      jnp.minimum(PI * qi * N0R * jnp.abs(vt2r - vt2i)
                                  * acr_r / 4.0, qi / dtcld), 0.0)
    piacr = jnp.where(cold_i & (qr > QCRMIN),
                      jnp.minimum(PI ** 2 * AVTR * N0R * DENR * xni * denfac
                                  * G6PBR * rsl3 * rsl3 * rslb / 24.0 / den,
                                  qr / dtcld), 0.0)
    acr_s = 2.0 * ssl3 + 2.0 * diameter * ssl2 + diameter ** 2 * ssl
    psaci = jnp.where(cold_i & (qs_ > QCRMIN),
                      jnp.minimum(PI * qi * eacrs * N0S * n0sfac
                                  * jnp.abs(vt2ave - vt2i) * acr_s / 4.0,
                                  qi / dtcld), 0.0)
    acr_g = 2.0 * gsl3 + 2.0 * diameter * gsl2 + diameter ** 2 * gsl
    pgaci = jnp.where(cold_i & (qg > QCRMIN),
                      jnp.minimum(PI * eacrs * qi * N0G
                                  * jnp.abs(vt2ave - vt2i) * acr_g / 4.0,
                                  qi / dtcld), 0.0)
    psacw = jnp.where((qs_ > QCRMIN) & (qc > QMIN),
                      jnp.minimum(PACRC * n0sfac * ssl3 * sslb * qc * denfac,
                                  qc / dtcld), 0.0)
    pgacw = jnp.where((qg > QCRMIN) & (qc > QMIN),
                      jnp.minimum(PACRG * gsl3 * gslb * qc * denfac,
                                  qc / dtcld), 0.0)
    paacw = jnp.where(qsum > 1e-15,
                      (qs_ * psacw + qg * pgacw) / qsum, 0.0)
    acr_rs = (5.0 * ssl3 * ssl3 * rsl + 2.0 * ssl3 * ssl2 * rsl2
              + 0.5 * ssl2 * ssl2 * rsl3)
    pracs = jnp.where((qs_ > QCRMIN) & (qr > QCRMIN) & (supcol > 0),
                      jnp.minimum(PI ** 2 * N0R * N0S * n0sfac
                                  * jnp.abs(vt2r - vt2ave) * (DENS / den)
                                  * acr_rs, qs_ / dtcld), 0.0)
    acr_sr = (5.0 * rsl3 * rsl3 * ssl + 2.0 * rsl3 * rsl2 * ssl2
              + 0.5 * rsl2 * rsl2 * ssl3)
    psacr = jnp.where((qs_ > QCRMIN) & (qr > QCRMIN),
                      jnp.minimum(PI ** 2 * N0R * N0S * n0sfac
                                  * jnp.abs(vt2ave - vt2r) * (DENR / den)
                                  * acr_sr, qr / dtcld), 0.0)
    acr_gr = (5.0 * rsl3 * rsl3 * gsl + 2.0 * rsl3 * rsl2 * gsl2
              + 0.5 * rsl2 * rsl2 * gsl3)
    pgacr = jnp.where((qg > QCRMIN) & (qr > QCRMIN),
                      jnp.minimum(PI ** 2 * N0R * N0G
                                  * jnp.abs(vt2ave - vt2r) * (DENR / den)
                                  * acr_gr, qr / dtcld), 0.0)
    pgacs = zero   # eliminated in V3.0 (combined snow/graupel fall speed)

    # enhanced melting (supcol <= 0)
    melt_zone = supcol <= 0
    pseml = jnp.where(melt_zone & (qs_ > 0),
                      jnp.clip(CLIQ * supcol * (paacw + psacr) / XLF0,
                               -qs_ / dtcld, 0.0), 0.0)
    pgeml = jnp.where(melt_zone & (qg > 0),
                      jnp.clip(CLIQ * supcol * (paacw + pgacr) / XLF0,
                               -qg / dtcld, 0.0), 0.0)

    # deposition chain with cumulative saturation flags (supcol > 0)
    cold = supcol > 0
    pidep_raw = 4.0 * diameter * xni * (rh_i - 1.0) / work1_i
    supice1 = satdt - prevp
    pidep = jnp.where(cold & (qi > 0),
                      jnp.where(pidep_raw < 0,
                                jnp.maximum(jnp.maximum(
                                    jnp.maximum(pidep_raw, satdt / 2),
                                    supice1), -qi / dtcld),
                                jnp.minimum(jnp.minimum(pidep_raw, satdt / 2),
                                            supice1)), 0.0)
    ifsat1 = jnp.abs(prevp + pidep) >= jnp.abs(satdt)
    coeres_s = ssl2 * jnp.sqrt(ssl * sslb)
    psdep_raw = (rh_i - 1.0) * n0sfac * (PRECS1 * ssl2
                                         + PRECS2 * work2v * coeres_s) / work1_i
    supice2 = satdt - prevp - pidep
    psdep = jnp.where(cold & (qs_ > 0) & ~ifsat1,
                      jnp.where(psdep_raw < 0,
                                jnp.maximum(jnp.maximum(
                                    jnp.maximum(psdep_raw, -qs_ / dtcld),
                                    satdt / 2), supice2),
                                jnp.minimum(jnp.minimum(psdep_raw, satdt / 2),
                                            supice2)), 0.0)
    ifsat2 = ifsat1 | (jnp.abs(prevp + pidep + psdep) >= jnp.abs(satdt))
    coeres_g = gsl2 * jnp.sqrt(gsl * gslb)
    pgdep_raw = (rh_i - 1.0) * (PRECG1 * gsl2
                                + PRECG2 * work2v * coeres_g) / work1_i
    supice3 = satdt - prevp - pidep - psdep
    pgdep = jnp.where(cold & (qg > 0) & ~ifsat2,
                      jnp.where(pgdep_raw < 0,
                                jnp.maximum(jnp.maximum(
                                    jnp.maximum(pgdep_raw, -qg / dtcld),
                                    satdt / 2), supice3),
                                jnp.minimum(jnp.minimum(pgdep_raw, satdt / 2),
                                            supice3)), 0.0)
    ifsat3 = ifsat2 | (jnp.abs(prevp + pidep + psdep + pgdep)
                       >= jnp.abs(satdt))
    supice4 = satdt - prevp - pidep - psdep - pgdep
    xni0 = 1e3 * jnp.exp(0.1 * supcol)
    roqi0 = 4.92e-11 * xni0 ** 1.33
    pigen = jnp.where(cold & (supsat_i > 0) & ~ifsat3,
                      jnp.minimum(jnp.minimum(jnp.maximum(
                          (roqi0 / den - jnp.maximum(qi, 0.0)) / dtcld, 0.0),
                          satdt), supice4), 0.0)
    psaut = jnp.where(cold & (qi > 0),
                      jnp.maximum(0.0, (qi - ROQIMAX / den) / dtcld), 0.0)
    alpha2 = 1e-3 * jnp.exp(0.09 * (-supcol))
    pgaut = jnp.where(cold & (qs_ > 0),
                      jnp.minimum(jnp.maximum(0.0, alpha2 * (qs_ - QS0)),
                                  qs_ / dtcld), 0.0)

    # evaporation of melting snow/graupel (supcol < 0)
    warm_e = supcol < 0
    psevp = jnp.where(warm_e & (qs_ > 0) & (rh_w < 1),
                      jnp.clip((rh_w - 1.0) * n0sfac
                               * (PRECS1 * ssl2 + PRECS2 * work2v * coeres_s)
                               / work1_w, -qs_ / dtcld, 0.0), 0.0)
    pgevp = jnp.where(warm_e & (qg > 0) & (rh_w < 1),
                      jnp.clip((rh_w - 1.0)
                               * (PRECG1 * gsl2 + PRECG2 * work2v * coeres_g)
                               / work1_w, -qg / dtcld, 0.0), 0.0)

    # ---- conservation scaling + updates (:1135-1320) -------------------
    delta2 = jnp.where((qr < 1e-4) & (qs_ < 1e-4), 1.0, 0.0)
    delta3 = jnp.where(qr < 1e-4, 1.0, 0.0)
    coldT = t <= T0C

    # cold branch scalings
    fc_c = _scale(jnp.maximum(QMIN, qc), [praut, pracw, paacw, paacw], dtcld)
    praut_c, pracw_c, paacw_c = praut * fc_c, pracw * fc_c, paacw * fc_c
    fi_c = _scale(jnp.maximum(QMIN, qi),
                  [psaut, -pigen, -pidep, praci, psaci, pgaci], dtcld)
    psaut_c, pigen_c, pidep_c = psaut * fi_c, pigen * fi_c, pidep * fi_c
    praci_c, psaci_c, pgaci_c = praci * fi_c, psaci * fi_c, pgaci * fi_c
    fr_c = _scale(jnp.maximum(QMIN, qr),
                  [-praut_c, -prevp, -pracw_c, piacr, psacr, pgacr], dtcld)
    praut_c, prevp_c, pracw_c = praut_c * fr_c, prevp * fr_c, pracw_c * fr_c
    piacr_c, psacr_c, pgacr_c = piacr * fr_c, psacr * fr_c, pgacr * fr_c
    fs_c = _scale(jnp.maximum(QMIN, qs_),
                  [-(psdep + psaut_c - pgaut + paacw_c + piacr_c * delta3
                     + praci_c * delta3 - pracs * (1 - delta2)
                     + psacr_c * delta2 + psaci_c - pgacs)], dtcld)
    psdep_c, psaut_c, pgaut_c = psdep * fs_c, psaut_c * fs_c, pgaut * fs_c
    paacw_c2, piacr_c, praci_c = paacw_c * fs_c, piacr_c * fs_c, praci_c * fs_c
    psaci_c, pracs_c, psacr_c = psaci_c * fs_c, pracs * fs_c, psacr_c * fs_c
    pgacs_c = pgacs * fs_c
    fg_c = _scale(jnp.maximum(QMIN, qg),
                  [-(pgdep + pgaut_c + piacr_c * (1 - delta3)
                     + praci_c * (1 - delta3) + psacr_c * (1 - delta2)
                     + pracs_c * (1 - delta2) + pgaci_c + paacw_c2 + pgacr_c
                     + pgacs_c)], dtcld)
    pgdep_c, pgaut_c, piacr_c = pgdep * fg_c, pgaut_c * fg_c, piacr_c * fg_c
    praci_c, psacr_c, pracs_c = praci_c * fg_c, psacr_c * fg_c, pracs_c * fg_c
    paacw_c3, pgaci_c, pgacr_c = paacw_c2 * fg_c, pgaci_c * fg_c, pgacr_c * fg_c
    pgacs_c = pgacs_c * fg_c

    dqv_c = -(prevp_c + psdep_c + pgdep_c + pigen_c + pidep_c)
    qc_c = jnp.maximum(qc - (praut_c + pracw_c + paacw_c3 + paacw_c3) * dtcld,
                       0.0)
    qr_c = jnp.maximum(qr + (praut_c + pracw_c + prevp_c - piacr_c - pgacr_c
                             - psacr_c) * dtcld, 0.0)
    qi_c = jnp.maximum(qi - (psaut_c + praci_c + psaci_c + pgaci_c - pigen_c
                             - pidep_c) * dtcld, 0.0)
    qs_c = jnp.maximum(qs_ + (psdep_c + psaut_c + paacw_c3 - pgaut_c
                              + piacr_c * delta3 + praci_c * delta3
                              + psaci_c - pgacs_c - pracs_c * (1 - delta2)
                              + psacr_c * delta2) * dtcld, 0.0)
    qg_c = jnp.maximum(qg + (pgdep_c + pgaut_c + piacr_c * (1 - delta3)
                             + praci_c * (1 - delta3)
                             + psacr_c * (1 - delta2)
                             + pracs_c * (1 - delta2) + pgaci_c + paacw_c3
                             + pgacr_c + pgacs_c) * dtcld, 0.0)
    xlf = XLS - xl
    xlwork2_c = (-XLS * (psdep_c + pgdep_c + pidep_c + pigen_c)
                 - xl * prevp_c - xlf * (piacr_c + paacw_c3 + paacw_c3
                                         + pgacr_c + psacr_c))
    t_c = t - xlwork2_c / cpm * dtcld
    q_c = q + dqv_c * dtcld

    # warm branch scalings
    fc_w = _scale(jnp.maximum(QMIN, qc), [praut, pracw, paacw, paacw], dtcld)
    praut_w, pracw_w, paacw_w = praut * fc_w, pracw * fc_w, paacw * fc_w
    fr_w = _scale(jnp.maximum(QMIN, qr),
                  [-paacw_w, -praut_w, pseml, pgeml, -pracw_w, -paacw_w,
                   -prevp], dtcld)
    praut_w, prevp_w, pracw_w = praut_w * fr_w, prevp * fr_w, pracw_w * fr_w
    paacw_w, pseml_w, pgeml_w = paacw_w * fr_w, pseml * fr_w, pgeml * fr_w
    fs_w = _scale(jnp.maximum(QCRMIN, qs_), [pgacs - pseml_w - psevp], dtcld)
    pgacs_w, psevp_w, pseml_w = pgacs * fs_w, psevp * fs_w, pseml_w * fs_w
    fg_w = _scale(jnp.maximum(QCRMIN, qg),
                  [-(pgacs_w + pgevp + pgeml_w)], dtcld)
    pgacs_w, pgevp_w, pgeml_w = pgacs_w * fg_w, pgevp * fg_w, pgeml_w * fg_w

    dqv_w = -(prevp_w + psevp_w + pgevp_w)
    qc_w = jnp.maximum(qc - (praut_w + pracw_w + paacw_w + paacw_w) * dtcld,
                       0.0)
    qr_w = jnp.maximum(qr + (praut_w + pracw_w + prevp_w + paacw_w + paacw_w
                             - pseml_w - pgeml_w) * dtcld, 0.0)
    qs_w = jnp.maximum(qs_ + (psevp_w - pgacs_w + pseml_w) * dtcld, 0.0)
    qg_w = jnp.maximum(qg + (pgacs_w + pgevp_w + pgeml_w) * dtcld, 0.0)
    xlwork2_w = (-xl * (prevp_w + psevp_w + pgevp_w)
                 - xlf * (pseml_w + pgeml_w))
    t_w = t - xlwork2_w / cpm * dtcld
    q_w = q + dqv_w * dtcld

    q = jnp.where(coldT, q_c, q_w)
    qc = jnp.where(coldT, qc_c, qc_w)
    qi = jnp.where(coldT, qi_c, qi)
    qr = jnp.where(coldT, qr_c, qr_w)
    qs_ = jnp.where(coldT, qs_c, qs_w)
    qg = jnp.where(coldT, qg_c, qg_w)
    t = jnp.where(coldT, t_c, t_w)

    # ---- cloud condensation (pcond, :1355-1370) ------------------------
    tr = ttp / t
    es_w = jnp.minimum(PSAT * tr ** xa * jnp.exp(xb * (1.0 - tr)), 0.99 * p)
    qsat_w = jnp.maximum(EP2 * es_w / (p - es_w), QMIN)
    work1c = (jnp.maximum(q, QMIN) - qsat_w) \
        / (1.0 + xl * xl / (RV * cpm) * qsat_w / (t * t))
    pcond = jnp.minimum(jnp.maximum(work1c / dtcld, 0.0),
                        jnp.maximum(q, 0.0) / dtcld)
    pcond = jnp.where((qc > 0) & (work1c < 0),
                      jnp.maximum(work1c, -qc) / dtcld, pcond)
    q = q - pcond * dtcld
    qc = jnp.maximum(qc + pcond * dtcld, 0.0)
    t = t + pcond * xl / cpm * dtcld

    qc = jnp.where(qc <= QMIN, 0.0, qc)
    qi = jnp.where(qi <= QMIN, 0.0, qi)

    th = t / exner
    return th, q, qc, qi, qr, qs_, qg, rain, snow, graupel
