"""WSM3 3-class simple-ice microphysics (Hong, Dudhia & Chen 2004).

JAX re-implementation of /root/reference/src/physics/mp_wsm3.f90 (WRF
single-moment 3-class scheme): one cloud/ice class (qci) and one rain/snow
class (qrs) whose phase follows the local temperature, with warm-rain
(autoconversion, accretion, rain evaporation) and cold (ice nucleation,
deposition, aggregation, riming) process rates, melting/freezing at the
0C level, and hydrometeor sedimentation.

The reference's sequential per-(i,k) loops with saturation flags become
masked whole-grid expressions; ``ifsat`` ordering is preserved with
cumulative masks. Sedimentation uses CFL-substepped upwind transport with
the scheme's own terminal velocities instead of the reference's
semi-Lagrangian PLM remap (nislfv_rain_plm) — a documented divergence;
the PLM remap is a planned upgrade.

Column layout (z, y, x); z level 0 is the surface layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.indexing import take_level
import numpy as np

# physical constants as the ICAR driver passes them
# (mp_driver.f90:554-575, wrf_constants.f90)
G = 9.81
CPD = 1012.0
RD = 287.058
RV = 461.5
CPV = 4.0 * RV
T0C = 273.15
EP1 = RV / RD - 1.0
EP2 = RD / RV
QMIN = 1e-15           # wrf_constants epsilon
XLS = 2.85e6
XLV0 = 2.5e6
XLF0 = 3.5e5
CLIQ = 4190.0
CICE = 2106.0
PSAT = 610.78
DEN0 = 1.28            # rhoair0
DENR = 1000.0          # rhowater
DENS = 100.0           # rhosnow

# scheme parameters (mp_wsm3.f90:37-55)
DTCLDCR = 120.0
N0R = 8e6
AVTR = 841.9
BVTR = 0.8
R0 = 0.8e-5
PEAUT = 0.55
XNCR = 3e8
XMYU = 1.718e-5
AVTS = 11.72
BVTS = 0.41
N0SMAX = 1e11
LAMDARMAX = 8e4
LAMDASMAX = 1e5
DICON = 11.9
DIMAX = 500e-6
N0S = 2e6
ALPHA = 0.12
QCRMIN = 1e-9

PI = np.pi
XLV1 = CLIQ - CPV

# derived constants (wsm3init, mp_wsm3.f90:951-1006)
from math import gamma as _gamma

QC0 = 4.0 / 3.0 * PI * DENR * R0 ** 3 * XNCR / DEN0
QCK1 = 0.104 * 9.8 * PEAUT / (XNCR * DENR) ** (1.0 / 3.0) / XMYU * DEN0 ** (4.0 / 3.0)
_G3PBR = _gamma(3 + BVTR)
_G4PBR = _gamma(4 + BVTR)
_G5PBRO2 = _gamma(2.5 + 0.5 * BVTR)
PVTR = AVTR * _G4PBR / 6.0
PACRR = PI * N0R * AVTR * _G3PBR * 0.25
PRECR1 = 2.0 * PI * N0R * 0.78
PRECR2 = 2.0 * PI * N0R * 0.31 * AVTR ** 0.5 * _G5PBRO2
ROQIMAX = 2.08e22 * DIMAX ** 8
_G3PBS = _gamma(3 + BVTS)
_G4PBS = _gamma(4 + BVTS)
_G5PBSO2 = _gamma(2.5 + 0.5 * BVTS)
PVTS = AVTS * _G4PBS / 6.0
PACRS = PI * N0S * AVTS * _G3PBS * 0.25
PRECS1 = 4.0 * N0S * 0.65
PRECS2 = 4.0 * N0S * 0.44 * AVTS ** 0.5 * _G5PBSO2
PIDN0R = PI * DENR * N0R
PIDN0S = PI * DENS * N0S
RSLOPERMAX = 1.0 / LAMDARMAX
RSLOPESMAX = 1.0 / LAMDASMAX


def _saturation(t, p):
    """Inlined fpvs: mixing-ratio saturation wrt ice below the triple point
    and water above (mp_wsm3.f90:455-483). Returns (qs_mixed, qs0_ratio)."""
    ttp = T0C + 0.01
    dldt = CPV - CLIQ
    xa = -dldt / RV
    xb = xa + XLV0 / (RV * ttp)
    dldti = CPV - CICE
    xai = -dldti / RV
    xbi = xai + XLS / (RV * ttp)
    tr = ttp / t
    es_w = PSAT * tr ** xa * jnp.exp(xb * (1.0 - tr))
    es_i = PSAT * tr ** xai * jnp.exp(xbi * (1.0 - tr))
    es = jnp.where(t < ttp, es_i, es_w)
    qs0 = (es_w - es) / es
    es = jnp.minimum(es, 0.99 * p)
    qs = EP2 * es / (p - es)
    qs = jnp.maximum(qs, QMIN)
    return qs, qs0


def _slopes(qrs, den, denfac, t):
    """Marshall-Palmer slope parameters + terminal velocity for the
    rain-or-snow class (slope_wsm3, mp_wsm3.f90:1008-1068)."""
    supcol = T0C - t
    n0sfac = jnp.clip(jnp.exp(ALPHA * supcol), 1.0, N0SMAX / N0S)
    warm = t >= T0C

    lamda_r = (PIDN0R / (jnp.maximum(qrs, QCRMIN) * den)) ** 0.25
    lamda_s = (PIDN0S * n0sfac / (jnp.maximum(qrs, QCRMIN) * den)) ** 0.25
    rslope_r = jnp.where(qrs <= QCRMIN, RSLOPERMAX, 1.0 / lamda_r)
    rslope_s = jnp.where(qrs <= QCRMIN, RSLOPESMAX, 1.0 / lamda_s)
    rslope = jnp.where(warm, rslope_r, rslope_s)
    bvt = jnp.where(warm, BVTR, BVTS)
    rslopeb = rslope ** bvt
    rslope2 = rslope * rslope
    rslope3 = rslope2 * rslope
    pvt = jnp.where(warm, PVTR, PVTS)
    vt = pvt * rslopeb * denfac
    vt = jnp.where(qrs <= 0.0, 0.0, vt)
    return rslope, rslopeb, rslope2, rslope3, vt, n0sfac


def _sediment(q, vt, den, dz, dtcld):
    """CFL-substepped upwind sedimentation. Returns (q_new, surface_flux
    [kg/m^2 over dtcld], flux_divergence [kg/kg/s] per level)."""
    cfl = jnp.ceil(jnp.max(dtcld * vt / dz, axis=0))
    cfl = jnp.maximum(cfl, 1.0)
    n_max = jnp.max(cfl).astype(jnp.int32)
    fall_frac = dtcld / cfl                      # (ny, nx) substep dt

    def substep(carry):
        s, q, sfc = carry
        active = (s < cfl)
        dist = vt * fall_frac[None]              # fall distance this substep
        sed = dist[0] * q[0] * den[0]
        flux = dist[1:] * q[1:] * den[1:]
        zeros = jnp.zeros_like(q[:1])
        gain = jnp.concatenate([flux, zeros], axis=0)
        loss = jnp.concatenate([zeros, flux], axis=0)
        q_new = q + (gain - loss) / (den * dz)
        q_new = q_new.at[0].add(-sed / (dz[0] * den[0]))
        q = jnp.where(active[None], q_new, q)
        sfc = sfc + jnp.where(active, sed, 0.0)
        return s + 1, q, sfc

    sfc0 = jnp.zeros(q.shape[1:], q.dtype)
    _, q_out, sfc = jax.lax.while_loop(
        lambda c: c[0] < n_max, substep, (jnp.int32(0), q, sfc0))
    # flux proxy used by the melting term (fall = den*q*vt/dz)
    fall = den * q_out * vt / dz
    return q_out, sfc, fall


def wsm3(th, qv, qci, qrs, w_real, exner, p, dz, den, dt, rain, snow):
    """One WSM3 step (wsm32D, mp_wsm3.f90:218-903). All 3D args (z, y, x);
    rain/snow are (y, x) accumulators [mm]. The model's dt is capped at
    120 s (= the scheme's dtcldcr), so one minor loop suffices.

    Returns (th, qv, qci, qrs, rain, snow)."""
    t = th * exner
    dtcld = dt
    q = qv

    qci = jnp.maximum(qci, 0.0)
    qrs = jnp.maximum(qrs, 0.0)
    cpm = CPD * (1.0 - jnp.maximum(q, QMIN)) + jnp.maximum(q, QMIN) * CPV
    xl = XLV0 - XLV1 * (t - T0C)
    denfac = jnp.sqrt(DEN0 / den)

    qs, qs0 = _saturation(t, p)
    rh = jnp.maximum(q / qs, QMIN)

    # ---- sedimentation -------------------------------------------------
    _, _, _, _, vt_rs, _ = _slopes(qrs, den, denfac, t)
    qrs, sfc_rs, fall = _sediment(qrs, vt_rs, den, dz, dtcld)

    # ice crystal fall velocity [HDC 5a] (mp_wsm3.f90:546-556)
    xni = jnp.clip(5.38e7 * (den * jnp.maximum(qci, QMIN)) ** 0.75, 1e3, 1e6)
    xmi = den * qci / xni
    diameter_i = jnp.maximum(DICON * jnp.sqrt(xmi), 1e-25)
    vt_i = jnp.where((t < T0C) & (qci > 0.0),
                     1.49e4 * diameter_i ** 1.31, 0.0)
    qci, sfc_i, _ = _sediment(qci, vt_i, den, dz, dtcld)

    # ---- freezing / melting at the 0C level [D89 B16-B17] --------------
    nz = t.shape[0]
    karr = jnp.arange(nz)[:, None, None]
    warm3 = t >= T0C
    mstep = jnp.max(jnp.where(warm3, karr, -1), axis=0)          # (ny, nx)
    has_melt = mstep >= 0
    m0 = jnp.maximum(mstep, 0)
    w_at = take_level(w_real, m0)
    k1 = jnp.where((w_at > 0) & has_melt,
                   jnp.minimum(m0 + 1, nz - 1), m0)              # freeze lvl
    k2 = m0                                                      # melt lvl

    def gat(a, kk):
        return take_level(a, kk)

    qrsci = gat(qrs, k1) + gat(qci, k1)
    dz1, dzk = gat(dz, k1), gat(dz, k2)
    frzmlt = jnp.clip(-gat(w_real, k1) * qrsci / dz1,
                      -qrsci / dtcld, qrsci / dtcld)
    qrs_k1 = gat(qrs, k1)
    snomlt = jnp.clip(gat(fall, k2) / gat(den, k2),
                      -qrs_k1 / dtcld, qrs_k1 / dtcld)
    apply_m = has_melt & ((qrsci > 0) | (gat(fall, k2) > 0))
    dT1 = jnp.where(apply_m, -XLF0 / gat(cpm, k1) * frzmlt * dtcld, 0.0)
    dT2 = jnp.where(apply_m, -XLF0 / gat(cpm, k2) * snomlt * dtcld, 0.0)
    onehot1 = (karr == k1[None]).astype(t.dtype)
    onehot2 = (karr == k2[None]).astype(t.dtype)
    t = t + onehot1 * dT1[None] + onehot2 * dT2[None]

    # ---- surface precipitation ----------------------------------------
    # upwind sedimentation yields the surface mass flux directly [kg/m^2=mm]
    cold_sfc = (T0C - t[0]) > 0
    rain = rain + sfc_rs + jnp.where(cold_sfc, sfc_i, 0.0)
    snow = snow + jnp.where(cold_sfc, sfc_rs + sfc_i, 0.0)

    # ---- process rates -------------------------------------------------
    rslope, rslopeb, rslope2, rslope3, _, n0sfac = _slopes(qrs, den, denfac, t)

    def diffus(x, y):
        return 8.794e-5 * x ** 1.81 / y

    def viscos(x, y):
        return 1.496e-6 * (x * jnp.sqrt(x)) / (x + 120.0) / y

    def xka(x, y):
        return 1.414e3 * viscos(x, y) * y

    warm = t >= T0C
    xlx = jnp.where(warm, xl, XLS)
    work1 = (xlx * xlx * den / (xka(t, den) * RV * t * t)
             + 1.0 / (qs * diffus(t, p)))                  # diffac
    work2 = (viscos(t, den) / diffus(t, p)) ** (1.0 / 3.0) \
        / jnp.sqrt(viscos(t, den)) * jnp.sqrt(jnp.sqrt(DEN0 / den))  # venfac

    supsat = jnp.maximum(q, QMIN) - qs
    satdt = supsat / dtcld
    zero = jnp.zeros_like(t)

    # warm-rain processes [HDC 16, HL A40, HDC 14]
    paut_w = jnp.where(qci > QC0,
                       jnp.minimum(QCK1 * qci ** (7.0 / 3.0), qci / dtcld),
                       0.0)
    pacr_w = jnp.where((qrs > QCRMIN) & (qci > QMIN),
                       jnp.minimum(PACRR * rslope3 * rslopeb * qci * denfac,
                                   qci / dtcld), 0.0)
    coeres = rslope2 * jnp.sqrt(rslope * rslopeb)
    pres_raw = (rh - 1.0) * (PRECR1 * rslope2
                             + PRECR2 * work2 * coeres) / work1
    pres_w = jnp.where(qrs > 0,
                       jnp.where(pres_raw < 0,
                                 jnp.maximum(jnp.maximum(pres_raw,
                                                         -qrs / dtcld),
                                             satdt / 2),
                                 jnp.minimum(pres_raw, satdt / 2)),
                       0.0)

    # cold processes [HDC 5-16]
    supcol = T0C - t
    eacrs = jnp.exp(0.07 * (-supcol))
    xmi = den * qci / xni
    diameter = jnp.minimum(DICON * jnp.sqrt(jnp.maximum(xmi, 0.0)), DIMAX)
    vt2i = 1.49e4 * jnp.maximum(diameter, 1e-25) ** 1.31
    vt2s = PVTS * rslopeb * denfac
    acrfac = 2.0 * rslope3 + 2.0 * diameter * rslope2 + diameter ** 2 * rslope
    pacr_c = jnp.where((qrs > QCRMIN) & (qci > QMIN),
                       jnp.minimum(PI * qci * eacrs * N0S * n0sfac
                                   * jnp.abs(vt2s - vt2i) * acrfac / 4.0,
                                   qci / dtcld), 0.0)
    # pidep: ice deposition/sublimation [HDC 9]
    pisd_raw = 4.0 * diameter * xni * (rh - 1.0) / work1
    pisd_c = jnp.where(qci > 0,
                       jnp.where(pisd_raw < 0,
                                 jnp.maximum(jnp.maximum(pisd_raw, satdt / 2),
                                             -qci / dtcld),
                                 jnp.minimum(pisd_raw, satdt / 2)),
                       0.0)
    ifsat1 = jnp.abs(pisd_c) >= jnp.abs(satdt)
    # psdep: snow deposition/sublimation [HDC 14]
    supice1 = satdt - pisd_c
    psdep_raw = (rh - 1.0) * n0sfac * (PRECS1 * rslope2
                                       + PRECS2 * work2 * coeres) / work1
    pres_c = jnp.where((qrs > 0) & ~ifsat1,
                       jnp.where(psdep_raw < 0,
                                 jnp.maximum(jnp.maximum(psdep_raw,
                                                         -qrs / dtcld),
                                             jnp.maximum(satdt / 2, supice1)),
                                 jnp.minimum(jnp.minimum(psdep_raw, satdt / 2),
                                             supice1)),
                       0.0)
    ifsat2 = ifsat1 | (jnp.abs(pisd_c + pres_c) >= jnp.abs(satdt))
    # pigen: ice nucleation [HDC 7-8]
    supice2 = satdt - pisd_c - pres_c
    xni0 = 1e3 * jnp.exp(0.1 * supcol)
    roqi0 = 4.92e-11 * xni0 ** 1.33
    pgen_c = jnp.where((supsat > 0) & ~ifsat2,
                       jnp.minimum(jnp.minimum(jnp.maximum(
                           (roqi0 / den - jnp.maximum(qci, 0.0)) / dtcld, 0.0),
                           satdt), supice2),
                       0.0)
    # psaut: ice aggregation to snow [HDC 12]
    qimax = ROQIMAX / den
    paut_c = jnp.where(qci > 0,
                       jnp.maximum(0.0, (qci - qimax) / dtcld), 0.0)

    paut = jnp.where(warm, paut_w, paut_c)
    pacr = jnp.where(warm, pacr_w, pacr_c)
    pres = jnp.where(warm, pres_w, pres_c)
    pisd = jnp.where(warm, zero, pisd_c)
    pgen = jnp.where(warm, zero, pgen_c)

    # ---- conservation scaling (mp_wsm3.f90:822-858) --------------------
    qciik = jnp.maximum(QMIN, qci)
    delqci = (paut + pacr - pgen - pisd) * dtcld
    facqci = jnp.where(delqci >= qciik, qciik / jnp.where(delqci == 0, 1.0,
                                                          delqci), 1.0)
    paut, pacr, pgen, pisd = (x * facqci for x in (paut, pacr, pgen, pisd))
    qik = jnp.maximum(QMIN, q)
    delq = (pres + pgen + pisd) * dtcld
    facq = jnp.where(delq >= qik, qik / jnp.where(delq == 0, 1.0, delq), 1.0)
    pres, pgen, pisd = (x * facq for x in (pres, pgen, pisd))

    dq = -(pres + pgen + pisd)
    q = q + dq * dtcld
    qci = jnp.maximum(qci - (paut + pacr - pgen - pisd) * dtcld, 0.0)
    qrs = jnp.maximum(qrs + (paut + pacr + pres) * dtcld, 0.0)
    t = t - jnp.where(t < T0C, XLS, xl) * dq / cpm * dtcld

    # ---- condensation of cloud water (pcond) ---------------------------
    ttp = T0C + 0.01
    tr = ttp / t
    dldt = CPV - CLIQ
    xa = -dldt / RV
    xb = xa + XLV0 / (RV * ttp)
    es_w = PSAT * tr ** xa * jnp.exp(xb * (1.0 - tr))
    es_w = jnp.minimum(es_w, 0.99 * p)
    qs_w = jnp.maximum(EP2 * es_w / (p - es_w), QMIN)
    work1c = (jnp.maximum(q, QMIN) - qs_w) \
        / (1.0 + xl * xl / (RV * cpm) * qs_w / (t * t))     # conden
    pcon = jnp.minimum(jnp.maximum(work1c, 0.0), jnp.maximum(q, 0.0)) / dtcld
    pcon = jnp.where((qci > 0) & (work1c < 0) & (t > T0C),
                     jnp.maximum(work1c, -qci) / dtcld, pcon)
    q = q - pcon * dtcld
    qci = jnp.maximum(qci + pcon * dtcld, 0.0)
    t = t + pcon * xl / cpm * dtcld

    # padding for small values
    qci = jnp.where(qci <= QMIN, 0.0, qci)
    qrs = jnp.where(qrs <= QCRMIN, 0.0, qrs)

    th = t / exner
    return th, q, qci, qrs, rain, snow
