"""Noah land-surface model (unified NoahLSM v1.0, 2007).

JAX re-implementation of /root/reference/src/physics/lsm_noahlsm.f90
(SFLX and its subtree) and the per-point driver lsm_noahdrv.f90
(lsm_noah, lines 36-1018), vectorized over the whole (ny, nx) grid with
masked `where` branches instead of the reference's per-column IF trees:
4-layer soil heat diffusion with phase change (HRT/HSTEP/SNKSRC/FRH2O),
Richards-equation soil moisture with the Schaake/Koren infiltration and
the Kalnay-Kanamitsu two-pass scheme (SRT/SSTEP), Penman potential
evaporation, Jarvis canopy resistance (CANRES), direct/canopy/
transpiration evap partition (EVAPO), and the snowpack branch (SNOPAC:
snow-cover fraction, Livneh albedo decay, compaction, melt).

The snow and no-snow pathways (NOPAC/SNOPAC) are fused: each shared
solver (EVAPO, SMFLX, SHFLX) runs once on branch-selected inputs, so the
cost is one solve per step instead of two.

UA-physics, urban canopy, and WRF-hydro extensions are compiled out in
the reference ICAR build (ua_phys=.false., no urban model) and are not
ported. The glacial-ice special case (ICE=-1) matches the reference's
behavior of skipping the land physics entirely at those points.

Layout: 2D fields (ny, nx); soil fields (4, ny, nx), layer 0 at top.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import noah_params as NP
from .noah_params import NSOIL

# module constants (lsm_noahlsm.f90:11-21)
CP = 1004.5
RD = 287.04
SIGMA = 5.67e-8
CPH2O = 4.218e3
CPICE = 2.106e3
LSUBF = 3.335e5
EMISSI_S = 0.95
XLV = 2.5e6
XLF = 3.5e5
RHOWATER = 1000.0
TFREEZ = 273.15
LVH2O = 2.501e6
LSUBS = 2.83e6
LSUBC = 2.501e6
R = 287.04
KARMAN = 0.4


def _zsoil():
    z = -np.cumsum(NP.DZS)
    return z.astype(np.float32)            # (4,) negative depths


ZSOIL = _zsoil()


# ---------------------------------------------------------------------------
# small physics helpers
# ---------------------------------------------------------------------------

def csnow(sndens):
    """Snow thermal conductivity, doubled Dyachkova form
    (lsm_noahlsm.f90:1119-1158)."""
    return 2.0 * 0.11631 * 0.328 * 10.0 ** (2.25 * sndens)


def tdfcnd(smc, qz, smcmax, sh2o):
    """Peters-Lidard soil thermal conductivity
    (lsm_noahlsm.f90:3849-3956)."""
    satratio = smc / smcmax
    thks = 7.7 ** qz * 2.0 ** (1.0 - qz)
    xunfroz = sh2o / jnp.maximum(smc, 1e-9)
    xu = xunfroz * smcmax
    thksat = thks ** (1. - smcmax) * 2.2 ** (smcmax - xu) * 0.57 ** xu
    gammd = (1. - smcmax) * 2700.
    thkdry = (0.135 * gammd + 64.7) / (2700. - 0.947 * gammd)
    ake_unfr = jnp.where(satratio > 0.1,
                         jnp.log10(jnp.maximum(satratio, 1e-10)) + 1.0, 0.0)
    ake = jnp.where((sh2o + 0.0005) < smc, satratio, ake_unfr)
    return ake * (thksat - thkdry) + thkdry


def wdfcnd(smc, smcmax, bexp, dksat, dwsat, sicemax):
    """Soil water diffusivity + hydraulic conductivity
    (lsm_noahlsm.f90:4170-4228)."""
    factr2 = smc / smcmax
    factr1 = jnp.minimum(0.05 / smcmax, factr2)
    expon = bexp + 2.0
    wdf = dwsat * factr2 ** expon
    vkwgt = 1. / (1. + (500. * sicemax) ** 3)
    wdf = jnp.where(sicemax > 0.0,
                    vkwgt * wdf + (1. - vkwgt) * dwsat * factr1 ** expon,
                    wdf)
    wcnd = dksat * factr2 ** ((2.0 * bexp) + 3.0)
    return wdf, wcnd


def frh2o(tkelv, smc, sh2o, smcmax, bexp, psis):
    """Supercooled liquid water (Koren et al. 1999 eqn 17), vectorized
    Newton iteration with a fixed 10 steps (lsm_noahlsm.f90:1405-1543;
    the explicit Flerchinger fallback for non-convergence is dropped —
    10 masked iterations always converge for the CK=8 form)."""
    bx = jnp.minimum(bexp, 5.5)
    CK = 8.0
    HLICE, GS, T0 = 3.335e5, 9.81, 273.15
    swl = jnp.clip(smc - sh2o, 0.0, smc - 0.02)
    frozen = tkelv <= (T0 - 1e-3)
    tk = jnp.where(frozen, tkelv, T0 - 1.0)    # safe dummy where unfrozen
    for _ in range(10):
        df = jnp.log((psis * GS / HLICE) * ((1. + CK * swl) ** 2)
                     * (smcmax / (smc - swl)) ** bx) \
            - jnp.log(-(tk - T0) / tk)
        denom = 2. * CK / (1. + CK * swl) + bx / (smc - swl)
        swl = jnp.clip(swl - df / denom, 0.0, smc - 0.02)
    return jnp.where(frozen, smc - swl, smc)


def snfrac(sneqv, snup, salp, snowh):
    """Fractional snow cover (lsm_noahlsm.f90:2635-2737, non-UA path)."""
    rsnow = sneqv / jnp.maximum(snup, 1e-9)
    sncovr = jnp.where(sneqv < snup,
                       1. - (jnp.exp(-salp * rsnow)
                             - rsnow * np.exp(-salp)), 1.0)
    return sncovr


def alcalc(alb, snoalb, sncovr, snowng, snotime1, dt, embrd):
    """Livneh snow-albedo decay (lsm_noahlsm.f90:862-977)."""
    SNACCA, SNACCB = 0.94, 0.58
    emissi = embrd + sncovr * (EMISSI_S - embrd)
    snoalb1 = snoalb + NP.LVCOEF * (0.85 - snoalb)
    snotime1 = jnp.where(snowng, 0.0, snotime1 + dt)
    snoalb2 = jnp.where(snowng, snoalb1,
                        snoalb1 * SNACCA ** ((snotime1 / 86400.0)
                                             ** SNACCB))
    snoalb2 = jnp.maximum(snoalb2, alb)
    albedo = jnp.minimum(alb + sncovr * (snoalb2 - alb), snoalb2)
    return albedo, emissi, snotime1


def snow_new(temp, newsn, snowh, sndens):
    """New-snowfall density/depth update (lsm_noahlsm.f90:3400-3454)."""
    snowhc = snowh * 100.
    newsnc = newsn * 100.
    tempc = temp - 273.15
    dsnew = jnp.where(tempc <= -15., 0.05,
                      0.05 + 0.0017 * jnp.maximum(tempc + 15., 0.) ** 1.5)
    hnewc = newsnc / dsnew
    sndens = jnp.where(snowhc + hnewc < 1e-3,
                       jnp.maximum(dsnew, sndens),
                       (snowhc * sndens + hnewc * dsnew)
                       / jnp.maximum(snowhc + hnewc, 1e-10))
    snowh = (snowhc + hnewc) * 0.01
    return snowh, sndens


def snowpack_compact(esd, dtsec, snowh, sndens, tsnow, tsoil):
    """Snow compaction, Koren/Anderson (lsm_noahlsm.f90:3210-3340)."""
    C1, C2 = 0.01, 21.0
    snowhc = snowh * 100.
    esdc = esd * 100.
    dthr = dtsec / 3600.
    tsnowc = tsnow - 273.15
    tsoilc = tsoil - 273.15
    tavgc = 0.5 * (tsnowc + tsoilc)
    esdcx = jnp.maximum(esdc, 1e-2)
    bfac = dthr * C1 * jnp.exp(0.08 * tavgc - C2 * sndens)
    # 4-term polynomial expansion of (e^x - 1)/x
    pexp = jnp.zeros_like(esdcx)
    for j in range(4, 0, -1):
        pexp = (1. + pexp) * bfac * esdcx / (j + 1)
    pexp = pexp + 1.
    dsx = jnp.clip(sndens * pexp, 0.05, 0.40)
    dw = 0.13 * dthr / 24.
    sndens = jnp.where(tsnowc >= 0.,
                       jnp.minimum(dsx * (1. - dw) + dw, 0.40), dsx)
    snowhc = esdc / jnp.maximum(sndens, 1e-9)
    return snowhc * 0.01, sndens


def snowz0(sncovr, z0brd, snowh):
    """Roughness under snow (lsm_noahlsm.f90:3345-3395, non-UA)."""
    Z0S = 0.001
    burial = 7.0 * z0brd - snowh
    z0eff = jnp.where(burial <= 0.0007, Z0S, burial / 7.0)
    return (1. - sncovr) * z0brd + sncovr * z0eff


def rosr12(a, b, c, d):
    """Tridiagonal solve over the leading soil axis
    (lsm_noahlsm.f90:2374-2433); returns p (the solution)."""
    n = a.shape[0]
    c = c.at[n - 1].set(0.0)
    p = [None] * n
    delta = [None] * n
    p[0] = -c[0] / b[0]
    delta[0] = d[0] / b[0]
    for k in range(1, n):
        denom = 1.0 / (b[k] + a[k] * p[k - 1])
        p[k] = -c[k] * denom
        delta[k] = (d[k] - a[k] * delta[k - 1]) * denom
    out = [None] * n
    out[n - 1] = delta[n - 1]
    for k in range(n - 2, -1, -1):
        out[k] = p[k] * out[k + 1] + delta[k]
    return jnp.stack(out)


def tbnd(tu, tb, k, zbot):
    """Layer-boundary temperature (lsm_noahlsm.f90:3800-3846)."""
    zup = 0.0 if k == 0 else ZSOIL[k - 1]
    zb = 2. * zbot - ZSOIL[k] if k == NSOIL - 1 else ZSOIL[k + 1]
    return tu + (tb - tu) * (zup - ZSOIL[k]) / (zup - zb)


def tmpavg(tup, tm, tdn, k):
    """Freezing-aware layer-average temperature
    (lsm_noahlsm.f90:3958-4060)."""
    T0 = 273.15
    dz = -ZSOIL[0] if k == 0 else ZSOIL[k - 1] - ZSOIL[k]
    dzh = dz * 0.5
    eps = 1e-9

    def safe_div(a_, b_):
        return a_ / jnp.where(jnp.abs(b_) < eps, jnp.sign(b_) * eps + eps,
                              b_)
    x0 = (T0 - tm) * dzh * safe_div(jnp.ones_like(tm), (tdn - tm))
    xup_a = (T0 - tup) * dzh * safe_div(jnp.ones_like(tm), (tm - tup))
    xdn_a = dzh - (T0 - tm) * dzh * safe_div(jnp.ones_like(tm), (tdn - tm))
    xup_b = dzh - (T0 - tup) * dzh * safe_div(jnp.ones_like(tm),
                                              (tm - tup))
    xdn_b = (T0 - tm) * dzh * safe_div(jnp.ones_like(tm), (tdn - tm))
    all4 = (tup + 2.0 * tm + tdn) / 4.0

    cold_up = tup < T0
    cold_m = tm < T0
    cold_dn = tdn < T0
    tavg = jnp.where(
        cold_up,
        jnp.where(
            cold_m,
            jnp.where(cold_dn, all4,
                      0.5 * (tup * dzh + tm * (dzh + x0)
                             + T0 * (2. * dzh - x0)) / dz),
            jnp.where(cold_dn,
                      0.5 * (tup * xup_a + T0 * (2. * dz - xup_a - xdn_a)
                             + tdn * xdn_a) / dz,
                      0.5 * (tup * xup_a + T0 * (2. * dz - xup_a)) / dz)),
        jnp.where(
            cold_m,
            jnp.where(cold_dn,
                      0.5 * (T0 * (dz - xup_b) + tm * (dzh + xup_b)
                             + tdn * dzh) / dz,
                      0.5 * (T0 * (2. * dz - xup_b - xdn_b)
                             + tm * (xup_b + xdn_b)) / dz),
            jnp.where(cold_dn,
                      (T0 * (dz - (dzh - xdn_b))
                       + 0.5 * (T0 + tdn) * (dzh - xdn_b)) / dz,
                      all4)))
    return tavg


def snksrc(tavg, smc, sh2o, smcmax, psisat, bexp, dt, k, qtot):
    """Phase-change heat source/sink + updated liquid water
    (lsm_noahlsm.f90:2740-2825)."""
    DH2O, HLICE = 1e3, 3.335e5
    dz = -ZSOIL[0] if k == 0 else ZSOIL[k - 1] - ZSOIL[k]
    free = frh2o(tavg, smc, sh2o, smcmax, bexp, psisat)
    xh2o = sh2o + qtot * dt / (DH2O * HLICE * dz)
    # freezing: don't freeze below the equilibrium free-water amount
    xh2o = jnp.where((xh2o < sh2o) & (xh2o < free),
                     jnp.where(free > sh2o, sh2o, free), xh2o)
    # thawing: don't thaw above equilibrium
    xh2o = jnp.where((xh2o > sh2o) & (xh2o > free),
                     jnp.where(free < sh2o, sh2o, free), xh2o)
    xh2o = jnp.clip(xh2o, 0.0, smc)
    tsnsr = -DH2O * HLICE * dz * (xh2o - sh2o) / dt
    return tsnsr, xh2o


# ---------------------------------------------------------------------------
# soil column solvers
# ---------------------------------------------------------------------------

def hrt_hstep(stc, smc, sh2o, smcmax, yy, zz1, tbot, zbot, psisat, dt,
              bexp, df1, quartz, csoil_loc):
    """Soil thermal diffusion solve with freeze/thaw source terms
    (HRT + HSTEP, lsm_noahlsm.f90:1546-1844). Returns (stc_new, sh2o_new).
    """
    CAIR, CICE_V, CH2O_V = 1004.0, 2.106e6, 4.2e6
    ai = [None] * NSOIL
    bi = [None] * NSOIL
    ci = [None] * NSOIL
    rhsts = [None] * NSOIL
    sh2o_new = [None] * NSOIL

    hcpct = sh2o[0] * CH2O_V + (1. - smcmax) * csoil_loc \
        + (smcmax - smc[0]) * CAIR + (smc[0] - sh2o[0]) * CICE_V
    ddz = 1.0 / (-0.5 * ZSOIL[1])
    ai[0] = jnp.zeros_like(stc[0])
    ci[0] = (df1 * ddz) / (ZSOIL[0] * hcpct)
    bi[0] = -ci[0] + df1 / (0.5 * ZSOIL[0] * ZSOIL[0] * hcpct * zz1)
    dtsdz = (stc[0] - stc[1]) / (-0.5 * ZSOIL[1])
    ssoil = df1 * (stc[0] - yy) / (0.5 * ZSOIL[0] * zz1)
    denom = ZSOIL[0] * hcpct
    rhsts[0] = (df1 * dtsdz - ssoil) / denom
    qtot = -1.0 * rhsts[0] * denom

    # freeze/thaw source for layer 0 (ITAVG=.true. path)
    sice = smc[0] - sh2o[0]
    tsurf = (yy + (zz1 - 1) * stc[0]) / zz1
    tbk = tbnd(stc[0], stc[1], 0, zbot)
    need = (sice > 0.) | (stc[0] < TFREEZ) | (tsurf < TFREEZ) \
        | (tbk < TFREEZ)
    tavg = tmpavg(tsurf, stc[0], tbk, 0)
    tsnsr, xh2o = snksrc(tavg, smc[0], sh2o[0], smcmax, psisat, bexp,
                         dt, 0, qtot)
    rhsts[0] = jnp.where(need, rhsts[0] - tsnsr / denom, rhsts[0])
    sh2o_new[0] = jnp.where(need, xh2o, sh2o[0])

    df1k = df1
    ddz2 = 0.0
    for k in range(1, NSOIL):
        hcpct = sh2o[k] * CH2O_V + (1. - smcmax) * csoil_loc \
            + (smcmax - smc[k]) * CAIR + (smc[k] - sh2o[k]) * CICE_V
        df1n = tdfcnd(smc[k], quartz, smcmax, sh2o[k])
        if k != NSOIL - 1:
            denom2 = 0.5 * (ZSOIL[k - 1] - ZSOIL[k + 1])
            dtsdz2 = (stc[k] - stc[k + 1]) / denom2
            ddz2 = 2. / (ZSOIL[k - 1] - ZSOIL[k + 1])
            ci[k] = -df1n * ddz2 / ((ZSOIL[k - 1] - ZSOIL[k]) * hcpct)
            tbk1 = tbnd(stc[k], stc[k + 1], k, zbot)
        else:
            denom2 = 0.5 * (ZSOIL[k - 1] + ZSOIL[k]) - zbot
            dtsdz2 = (stc[k] - tbot) / denom2
            ci[k] = jnp.zeros_like(stc[k])
            tbk1 = tbnd(stc[k], tbot, k, zbot)
        denom = (ZSOIL[k] - ZSOIL[k - 1]) * hcpct
        rhsts[k] = (df1n * dtsdz2 - df1k * dtsdz) / denom
        qtot = -1.0 * denom * rhsts[k]
        sice = smc[k] - sh2o[k]
        tavg = tmpavg(tbk, stc[k], tbk1, k)
        need = (sice > 0.) | (stc[k] < TFREEZ) | (tbk < TFREEZ) \
            | (tbk1 < TFREEZ)
        tsnsr, xh2o = snksrc(tavg, smc[k], sh2o[k], smcmax, psisat,
                             bexp, dt, k, qtot)
        rhsts[k] = jnp.where(need, rhsts[k] - tsnsr / denom, rhsts[k])
        sh2o_new[k] = jnp.where(need, xh2o, sh2o[k])
        ai[k] = -df1k * ddz / ((ZSOIL[k - 1] - ZSOIL[k]) * hcpct)
        bi[k] = -(ai[k] + ci[k])
        tbk = tbk1
        df1k = df1n
        dtsdz = dtsdz2
        ddz = ddz2

    # HSTEP: implicit update
    a = jnp.stack([x * dt if not np.isscalar(x) else jnp.zeros_like(stc[0])
                   for x in ai])
    b = jnp.stack([1. + x * dt for x in bi])
    c = jnp.stack([x * dt for x in ci])
    d = jnp.stack([x * dt for x in rhsts])
    dtemp = rosr12(a, b, c, d)
    stc_new = stc + dtemp
    return stc_new, jnp.stack(sh2o_new)


def srt_sstep(sh2o, sh2oa, smc, sice, cmc, pcpdrp, edir, et, dt,
              smcmax, smcwlt, bexp, dksat, dwsat, slope, kdt, frzx,
              shdfac, rhsct):
    """One Richards-equation solve (SRT + SSTEP,
    lsm_noahlsm.f90:3460-3800). Returns (sh2o_new, smc_new, cmc_new,
    runoff1, runoff2, runoff3)."""
    CVFRZ = 3
    sicemax = jnp.max(sice, axis=0)

    # Schaake/Koren infiltration
    dt1 = dt / 86400.
    smcav = smcmax - smcwlt
    dmax0 = -ZSOIL[0] * smcav * (1.0 - (sh2oa[0] + sice[0] - smcwlt)
                                 / smcav)
    dice = -ZSOIL[0] * sice[0]
    dd = dmax0
    for k in range(1, NSOIL):
        dzk = ZSOIL[k - 1] - ZSOIL[k]
        dice = dice + dzk * sice[k]
        dd = dd + dzk * smcav * (1.0 - (sh2oa[k] + sice[k] - smcwlt)
                                 / smcav)
    val = 1. - jnp.exp(-kdt * dt1)
    ddt = dd * val
    px = jnp.maximum(pcpdrp * dt, 0.0)
    infmax = (px * (ddt / jnp.maximum(px + ddt, 1e-20))) / dt
    # frozen-ground reduction (gamma-series correction)
    acrt = CVFRZ * frzx / jnp.maximum(dice, 1e-10)
    s = jnp.ones_like(acrt)
    ialp1 = CVFRZ - 1
    for j in range(1, ialp1 + 1):
        kfac = 1
        for jj in range(j + 1, ialp1 + 1):
            kfac *= jj
        s = s + (acrt ** (CVFRZ - j)) / float(kfac)
    fcr = jnp.where(dice > 1e-2, 1. - jnp.exp(-acrt) * s, 1.0)
    infmax = infmax * fcr
    wdf0, wcnd0 = wdfcnd(sh2oa[0], smcmax, bexp, dksat, dwsat, sicemax)
    infmax = jnp.clip(jnp.maximum(infmax, wcnd0), None, px / dt)
    runoff1 = jnp.where(pcpdrp > infmax, pcpdrp - infmax, 0.0)
    pddum = jnp.where(pcpdrp > infmax, infmax, pcpdrp)

    ai = [None] * NSOIL
    bi = [None] * NSOIL
    ci = [None] * NSOIL
    rhstt = [None] * NSOIL
    ddz = 1. / (-.5 * ZSOIL[1])
    ai[0] = jnp.zeros_like(sh2o[0])
    bi[0] = wdf0 * ddz / (-ZSOIL[0])
    ci[0] = -bi[0]
    dsmdz = (sh2o[0] - sh2o[1]) / (-.5 * ZSOIL[1])
    rhstt[0] = (wdf0 * dsmdz + wcnd0 - pddum + edir + et[0]) / ZSOIL[0]

    wdf, wcnd = wdf0, wcnd0
    runoff2 = None
    for k in range(1, NSOIL):
        denom2 = ZSOIL[k - 1] - ZSOIL[k]
        if k != NSOIL - 1:
            slopx = 1.0
            wdf2, wcnd2 = wdfcnd(sh2oa[k], smcmax, bexp, dksat, dwsat,
                                 sicemax)
            denom = ZSOIL[k - 1] - ZSOIL[k + 1]
            dsmdz2 = (sh2o[k] - sh2o[k + 1]) / (denom * 0.5)
            ddz2 = 2.0 / denom
            ci[k] = -wdf2 * ddz2 / denom2
        else:
            slopx = slope
            wdf2, wcnd2 = wdfcnd(sh2oa[NSOIL - 1], smcmax, bexp, dksat,
                                 dwsat, sicemax)
            dsmdz2 = 0.0
            ci[k] = jnp.zeros_like(sh2o[k])
        numer = wdf2 * dsmdz2 + slopx * wcnd2 - wdf * dsmdz - wcnd + et[k]
        rhstt[k] = numer / (-denom2)
        ai[k] = -wdf * ddz / denom2
        bi[k] = -(ai[k] + ci[k])
        if k == NSOIL - 1:
            runoff2 = slopx * wcnd2
        wdf, wcnd = wdf2, wcnd2
        dsmdz = dsmdz2
        ddz = ddz2

    # SSTEP
    a = jnp.stack([x * dt if not np.isscalar(x)
                   else jnp.zeros_like(sh2o[0]) for x in ai])
    b = jnp.stack([1. + x * dt for x in bi])
    c = jnp.stack([x * dt for x in ci])
    d = jnp.stack([x * dt for x in rhstt])
    incr = rosr12(a, b, c, d)

    sh2o_out = []
    smc_out = []
    wplus = jnp.zeros_like(sh2o[0])
    for k in range(NSOIL):
        ddzk = -ZSOIL[0] if k == 0 else ZSOIL[k - 1] - ZSOIL[k]
        val = sh2o[k] + incr[k] + wplus / ddzk
        stot = val + sice[k]
        wplus = jnp.where(stot > smcmax, (stot - smcmax) * ddzk, 0.0)
        smck = jnp.clip(stot, 0.02, smcmax)
        smc_out.append(smck)
        sh2o_out.append(jnp.maximum(smck - sice[k], 0.0))
    runoff3 = wplus
    cmc_new = cmc + dt * rhsct
    cmc_new = jnp.where(cmc_new < 1e-20, 0.0, cmc_new)
    cmc_new = jnp.minimum(cmc_new, NP.CMCMAX)
    return (jnp.stack(sh2o_out), jnp.stack(smc_out), cmc_new,
            runoff1, runoff2, runoff3)


def smflx(smc, cmc, dt, prcp1, sh2o, slope, kdt, frzfact, smcmax, bexp,
          smcwlt, dksat, dwsat, shdfac, edir, ec, et):
    """Canopy water + two-pass Richards solve (SMFLX,
    lsm_noahlsm.f90:2496-2631)."""
    rhsct = shdfac * prcp1 - ec
    trhsct = dt * rhsct
    excess = cmc + trhsct
    drip = jnp.maximum(excess - NP.CMCMAX, 0.0)
    pcpdrp = (1. - shdfac) * prcp1 + drip / dt
    sice = smc - sh2o

    fac2 = jnp.max(sh2o / smcmax, axis=0)
    # FAC2MIT table (lsm_noahlsm.f90:1382-1402) keyed on exact smcmax
    flimit = jnp.full_like(fac2, 0.90)
    for val, lim in ((0.395, 0.59), (0.434, 0.85), (0.404, 0.85),
                     (0.465, 0.86), (0.406, 0.86), (0.476, 0.74),
                     (0.439, 0.74), (0.200, 0.80), (0.464, 0.80)):
        flimit = jnp.where(jnp.abs(smcmax - val) < 1e-6, lim, flimit)

    two_pass = ((pcpdrp * dt) > (0.0001 * 1000.0 * (-ZSOIL[0]) * smcmax)) \
        | (fac2 > flimit)

    # pass A (always; equals the single-call scheme)
    dummy_cmc = jnp.zeros_like(cmc)
    sh2o_a, smc_a, cmc_a, r1_a, r2_a, r3_a = srt_sstep(
        sh2o, sh2o, smc, sice, cmc, pcpdrp, edir, et, dt, smcmax, smcwlt,
        bexp, dksat, dwsat, slope, kdt, frzfact, shdfac, rhsct)
    # pass B (Kalnay-Kanamitsu averaged-coefficient second call)
    sh2oa = (sh2o + sh2o_a) * 0.5
    sh2o_b, smc_b, cmc_b, r1_b, r2_b, r3_b = srt_sstep(
        sh2o, sh2oa, smc, sice, cmc, pcpdrp, edir, et, dt, smcmax, smcwlt,
        bexp, dksat, dwsat, slope, kdt, frzfact, shdfac, rhsct)

    sel2 = lambda a_, b_: jnp.where(two_pass, b_, a_)
    sel3 = lambda a_, b_: jnp.where(two_pass[None], b_, a_)
    return (sel3(sh2o_a, sh2o_b), sel3(smc_a, smc_b), sel2(cmc_a, cmc_b),
            sel2(r1_a, r1_b), sel2(r2_a, r2_b), sel2(r3_a, r3_b), drip)


# ---------------------------------------------------------------------------
# evaporation components
# ---------------------------------------------------------------------------

def devap(etp1, smc0, shdfac, smcmax, smcdry, fxexp):
    """Direct soil evaporation (lsm_noahlsm.f90:1160-1199)."""
    sratio = (smc0 - smcdry) / (smcmax - smcdry)
    fx = jnp.where(sratio > 0.,
                   jnp.clip(jnp.maximum(sratio, 1e-9) ** fxexp, 0., 1.),
                   0.)
    return fx * (1.0 - shdfac) * etp1


def transp(etp1, sh2o, cmc, shdfac, smcwlt, pc, smcref, nroot_mask,
           rtdis):
    """Per-layer transpiration (lsm_noahlsm.f90:4064-4167).
    nroot_mask: (4,ny,nx) 1.0 where layer is within the root zone."""
    cmc_ratio = jnp.clip(cmc / NP.CMCMAX, 0.0, 1.0)
    etp1a = jnp.where(cmc != 0.0,
                      shdfac * pc * etp1 * (1.0 - cmc_ratio ** NP.CFACTR),
                      shdfac * pc * etp1)
    gx = jnp.clip((sh2o - smcwlt) / (smcref - smcwlt), 0., 1.) * nroot_mask
    nroot = jnp.maximum(jnp.sum(nroot_mask, axis=0), 1.0)
    sgx = jnp.sum(gx, axis=0) / nroot
    rtx = rtdis + gx - sgx[None]
    gx = gx * jnp.maximum(rtx, 0.) * nroot_mask
    denom = jnp.sum(gx, axis=0)
    denom = jnp.where(denom <= 0.0, 1.0, denom)
    return etp1a[None] * gx / denom[None]


def evapo(smc, cmc, etp1, sh2o, pc, shdfac, smcmax, smcwlt, smcref,
          smcdry, fxexp, dt, nroot_mask, rtdis):
    """Total evapotranspiration split (EVAPO,
    lsm_noahlsm.f90:1294-1379). Returns (eta1, edir, ec, et)."""
    pos = etp1 > 0.0
    edir = jnp.where(pos & (shdfac < 1.),
                     devap(etp1, smc[0], shdfac, smcmax, smcdry, fxexp),
                     0.0)
    et = jnp.where(pos[None] & (shdfac[None] > 0.0),
                   transp(etp1, sh2o, cmc, shdfac, smcwlt, pc, smcref,
                          nroot_mask, rtdis), 0.0)
    ett = jnp.sum(et, axis=0)
    ec = jnp.where(pos & (shdfac > 0.0) & (cmc > 0.0),
                   shdfac * jnp.clip(cmc / NP.CMCMAX, 0., 1.)
                   ** NP.CFACTR * etp1, 0.0)
    ec = jnp.minimum(cmc / dt, ec)
    eta1 = edir + ett + ec
    return eta1, edir, ec, et


def canres(solar, ch, sfctmp, q2, sfcprs, sh2o, smcwlt, smcref, rsmin,
           rgl, hs, xlai, emissi, dqsdt2, q2sat, nroot_mask, topt,
           rsmax):
    """Jarvis canopy resistance -> plant coefficient (CANRES,
    lsm_noahlsm.f90:980-1116)."""
    SLV = 2.501e6
    ff = 0.55 * 2.0 * solar / (rgl * jnp.maximum(xlai, 1e-6))
    rcs = jnp.maximum((ff + rsmin / rsmax) / (1.0 + ff), 0.0001)
    rct = jnp.maximum(1.0 - 0.0016 * (topt - sfctmp) ** 2, 0.0001)
    rcq = jnp.maximum(1.0 / (1.0 + hs * (q2sat - q2)), 0.01)
    gx = jnp.clip((sh2o - smcwlt) / (smcref - smcwlt), 0., 1.)
    # soil-depth weighting over the root zone
    dz_frac = jnp.asarray(
        np.concatenate([[ZSOIL[0]], np.diff(ZSOIL)]), smcwlt.dtype)
    zroot = jnp.sum(dz_frac[:, None, None] * nroot_mask, axis=0)
    w = dz_frac[:, None, None] * nroot_mask / jnp.where(zroot == 0, 1.0,
                                                        zroot)[None]
    rcsoil = jnp.maximum(jnp.sum(w * gx, axis=0), 0.0001)
    rc = rsmin / (jnp.maximum(xlai, 1e-6) * rcs * rct * rcq * rcsoil)
    rr = (4. * emissi * SIGMA * RD / CP) * sfctmp ** 4 / (sfcprs * ch) \
        + 1.0
    delta = (SLV / CP) * dqsdt2
    pc = (rr + delta) / (rr * (1. + rc * ch) + delta)
    return rc, pc


def penman(sfctmp, sfcprs, ch, t2v, th2, prcp, fdown, ssoil, q2, q2sat,
           dqsdt2, snowng, frzgra, emissi, sncovr):
    """Potential evaporation (PENMAN, lsm_noahlsm.f90:2034-2149).
    Returns (etp, rch, epsca, rr, t24, flx2)."""
    ELCP = 2.4888e3
    CP_P = 1004.6
    elcp1 = (1.0 - sncovr) * ELCP + sncovr * ELCP * LSUBS / LSUBC
    lvs = (1.0 - sncovr) * LSUBC + sncovr * LSUBS
    delta = elcp1 * dqsdt2
    t24 = sfctmp ** 4
    rr = emissi * t24 * 6.48e-8 / (sfcprs * ch) + 1.0
    rho = sfcprs / (RD * t2v)
    rch = rho * CP_P * ch
    rr = rr + jnp.where(snowng, CPICE * prcp / rch,
                        jnp.where(prcp > 0.0, CPH2O * prcp / rch, 0.0))
    fnet = fdown - emissi * SIGMA * t24 - ssoil
    flx2 = jnp.where(frzgra, -LSUBF * prcp, 0.0)
    fnet = fnet - flx2
    rad = fnet / rch + th2 - sfctmp
    a = elcp1 * (q2sat - q2)
    epsca = (a * rr + rad * delta) / (delta + rr)
    etp = epsca * rch / lvs
    return etp, rch, epsca, rr, t24, flx2


# ---------------------------------------------------------------------------
# the main land-surface step (SFLX, lsm_noahlsm.f90:64-859)
# ---------------------------------------------------------------------------

def sflx(tables, ffrozp, dt, zlvl, lwdn, soldn, solnet, sfcprs, prcp,
         sfctmp, q2, th2, q2sat, dqsdt2, vegtyp, soiltyp, shdfac_in,
         alb_in, snoalb, tbot, ch, cmc, t1, stc, smc, sh2o, snowh,
         sneqv, snotime1):
    """One Noah step for every cell (apply a land mask outside).

    All array args (ny, nx) except stc/smc/sh2o (4, ny, nx).
    Returns a dict of updated state + fluxes."""
    T = tables
    slopetyp = 1   # lsm_noahdrv.f90:610

    def vgather(col):
        return jnp.asarray(col)[vegtyp]

    def sgather(col):
        return jnp.asarray(col)[soiltyp]

    # --- REDPRM (lsm_noahlsm.f90:2152-2372) -----------------------------
    bexp = sgather(T.bb)
    dksat = sgather(T.satdk)
    dwsat = sgather(T.satdw)
    f1 = sgather(T.f11)
    psisat = sgather(T.satpsi)
    quartz = sgather(T.qtz)
    smcdry = sgather(T.drysmc)
    smcmax = sgather(T.maxsmc)
    smcref = sgather(T.refsmc)
    smcwlt = sgather(T.wltsmc)
    kdt = NP.REFKDT * dksat / NP.REFDK
    slope = jnp.asarray(NP.SLOPE_DATA, bexp.dtype)[slopetyp]
    frzfact = (smcmax / smcref) * (0.412 / 0.468)
    frzx = NP.FRZK * frzfact
    nroot = vgather(T.nroot)
    snup = vgather(T.snup)
    rsmin = vgather(T.rsmin) if hasattr(T, "rsmin") else vgather(T.rs)
    rgl = vgather(T.rgl)
    hs = vgather(T.hs)
    emissmin, emissmax = vgather(T.emissmin), vgather(T.emissmax)
    laimin, laimax = vgather(T.laimin), vgather(T.laimax)
    z0min, z0max = vgather(T.z0min), vgather(T.z0max)
    albedomin, albedomax = vgather(T.albedomin), vgather(T.albedomax)
    shdfac = jnp.where(vegtyp == NP.BARE, 0.0, shdfac_in)

    # urban overrides (lsm_noahlsm.f90:418-425)
    urban = vegtyp == NP.ISURBAN
    shdfac = jnp.where(urban, 0.05, shdfac)
    rsmin = jnp.where(urban, 400.0, rsmin)
    smcmax = jnp.where(urban, 0.45, smcmax)
    smcref = jnp.where(urban, 0.42, smcref)
    smcwlt = jnp.where(urban, 0.40, smcwlt)
    smcdry = jnp.where(urban, 0.40, smcdry)

    # shdfac interpolation of emiss/lai/albedo/z0 (SHDMIN=0, SHDMAX=1 as
    # allocated in lsm_driver.f90:504-507 -> interp_fraction = shdfac)
    frac = jnp.clip(shdfac, 0.0, 1.0)
    embrd = (1. - frac) * emissmin + frac * emissmax
    xlai = (1. - frac) * laimin + frac * laimax
    alb = (1. - frac) * albedomax + frac * albedomin
    z0brd = (1. - frac) * z0min + frac * z0max

    kidx = jnp.arange(NSOIL)[:, None, None]
    nroot_mask = (kidx < nroot[None]).astype(stc.dtype)
    znroot = jnp.asarray(ZSOIL)[jnp.maximum(nroot - 1, 0)]
    rtdis = (jnp.asarray(NP.DZS, stc.dtype)[:, None, None]
             / (-znroot)[None]) * nroot_mask

    # --- snowpack init (lsm_noahlsm.f90:476-540) ------------------------
    no_snow0 = sneqv <= 1e-7
    sneqv = jnp.where(no_snow0, 0.0, sneqv)
    snowh = jnp.where(no_snow0, 0.0, snowh)
    sndens = jnp.where(no_snow0, 0.0,
                       sneqv / jnp.maximum(snowh, 1e-9))
    sncond = jnp.where(no_snow0, 1.0, csnow(sndens))

    precip_on = prcp > 0.0
    snowng = precip_on & (ffrozp > 0.5)
    frzgra = precip_on & ~snowng & (t1 <= TFREEZ)
    any_fr = snowng | frzgra
    sn_new = prcp * dt * 0.001
    sneqv = jnp.where(any_fr, sneqv + sn_new, sneqv)
    snowh_n, sndens_n = snow_new(sfctmp, sn_new, snowh, sndens)
    snowh = jnp.where(any_fr, snowh_n, snowh)
    sndens = jnp.where(any_fr, sndens_n, sndens)
    sncond = jnp.where(any_fr, csnow(sndens), sncond)
    prcpf = jnp.where(any_fr, 0.0, prcp)

    # --- snow cover + albedo (lsm_noahlsm.f90:543-576) ------------------
    snowpack = sneqv > 0.0
    sncovr = jnp.where(snowpack,
                       jnp.minimum(snfrac(sneqv, snup, NP.SALP, snowh),
                                   0.98), 0.0)
    alb_snow, emissi_snow, snotime1 = alcalc(alb, snoalb, sncovr, snowng,
                                             snotime1, dt, embrd)
    albedo = jnp.where(snowpack, alb_snow, alb)
    emissi = jnp.where(snowpack, emissi_snow, embrd)

    # --- thermal conductivity + initial soil heat flux (:577-650) -------
    df1 = tdfcnd(smc[0], quartz, smcmax, sh2o[0])
    df1 = jnp.where(urban, 3.24, df1)
    df1 = df1 * jnp.exp(NP.SBETA * shdfac)
    df1 = jnp.where(sncovr > 0.97, sncond, df1)
    dsoil = -0.5 * ZSOIL[0]
    dtot = snowh + dsoil
    frcsno = snowh / dtot
    frcsoi = dsoil / dtot
    df1h = (sncond * df1) / (frcsoi * sncond + frcsno * df1)
    df1a = frcsno * sncond + frcsoi * df1
    df1_snow = df1a * sncovr + df1 * (1.0 - sncovr)
    df1 = jnp.where(snowpack, df1_snow, df1)
    ssoil = jnp.where(snowpack,
                      df1 * (t1 - stc[0]) / dtot,
                      df1 * (t1 - stc[0]) / dsoil)

    z0 = jnp.where(sncovr > 0., snowz0(sncovr, z0brd, snowh), z0brd)

    # --- PENMAN + CANRES (:655-720) -------------------------------------
    fdown = solnet + lwdn
    t2v = sfctmp * (1.0 + 0.61 * q2)
    etp, rch, epsca, rr, t24, flx2 = penman(
        sfctmp, sfcprs, ch, t2v, th2, prcp, fdown, ssoil, q2, q2sat,
        dqsdt2, snowng, frzgra, emissi, sncovr)
    veg_on = (shdfac > 0.) & (xlai > 0.)
    rc, pc = canres(soldn, ch, sfctmp, q2, sfcprs, sh2o[0], smcwlt,
                    smcref, rsmin, rgl, hs, xlai, emissi, dqsdt2, q2sat,
                    nroot_mask, NP.TOPT, NP.RSMAX)
    pc = jnp.where(veg_on, pc, 0.0)

    # --- fused NOPAC / SNOPAC (:725-775; 1847-2031; 2828-3206) ----------
    # SNOPAC downward-ETP reduction for stable/strongly-forced cases
    # (RIBB term dropped: ICAR passes the bulk Ri which the reference
    # then uses identically; we keep it)
    etp_sno = etp
    prcp1_no = prcp * 0.001
    prcp1_sno = prcpf * 0.001
    etp1 = etp * 0.001
    dew = jnp.where(etp <= 0.0, -etp1, 0.0)
    prcp1_no = prcp1_no + dew

    # shared EVAPO (positive-etp cells only; zero otherwise)
    eta1, edir1, ec1, et1 = evapo(
        smc, cmc, etp1, sh2o, pc, shdfac, smcmax, smcwlt, smcref,
        smcdry, NP.FXEXP, dt, nroot_mask, rtdis)
    # SNOPAC scales the soil/canopy evap by the snow-free fraction
    snofrac = jnp.where(snowpack, 1. - sncovr, 1.0)
    edir1 = edir1 * snofrac
    ec1 = ec1 * snofrac
    et1 = et1 * snofrac[None]
    etns1 = eta1 * snofrac
    esnow = jnp.where(snowpack & (etp > 0.), etp * sncovr, 0.0)
    esnow1 = esnow * 0.001
    esnow2 = jnp.where(snowpack,
                       jnp.where(etp > 0., esnow1 * dt, etp1 * dt), 0.0)
    etanrg = jnp.where(etp > 0.,
                       esnow * LSUBS + etns1 * 1000.0 * LSUBC,
                       etp * ((1. - sncovr) * LSUBC + sncovr * LSUBS))

    # SNOPAC snowmelt energy balance (:3008-3135)
    flx1_sno = jnp.where(snowng, CPICE * prcp * (t1 - sfctmp),
                         jnp.where(precip_on,
                                   CPH2O * prcp * (t1 - sfctmp), 0.0))
    denom_t12 = 1.0 + df1 / (dtot * rr * rch)
    t12a = ((fdown - flx1_sno - flx2 - emissi * SIGMA * t24) / rch
            + th2 - sfctmp - etanrg / rch) / rr
    t12b = df1 * stc[0] / (dtot * rr * rch)
    t12 = (sfctmp + t12a + t12b) / denom_t12
    frozen12 = t12 <= TFREEZ
    SNOEXP = 2.0
    ESDMIN = 1e-6
    t1_sno_frz = t12
    esd_frz = jnp.maximum(0.0, sneqv - esnow2)
    t1_sno_mlt = TFREEZ * sncovr ** SNOEXP + t12 * (1.0 - sncovr
                                                    ** SNOEXP)
    ssoil_sno_frz = df1 * (t1_sno_frz - stc[0]) / dtot
    ssoil_sno_mlt = df1 * (t1_sno_mlt - stc[0]) / dtot
    # melting branch details
    gone = (sneqv - esnow2) <= ESDMIN
    esd_m = sneqv - esnow2
    seh = rch * (t1_sno_mlt - th2)
    t14 = t1_sno_mlt ** 4
    flx3_raw = jnp.maximum(
        fdown - flx1_sno - flx2 - emissi * SIGMA * t14
        - ssoil_sno_mlt - seh - etanrg, 0.0)
    ex_raw = flx3_raw * 0.001 / LSUBF
    snomlt_raw = ex_raw * dt
    melts_all = (esd_m - snomlt_raw) < ESDMIN
    ex_mlt = jnp.where(gone, 0.0,
                       jnp.where(melts_all, esd_m / dt, ex_raw))
    flx3 = jnp.where(gone, 0.0,
                     jnp.where(melts_all, ex_mlt * 1000.0 * LSUBF,
                               flx3_raw))
    snomlt_sno = jnp.where(gone, 0.0,
                           jnp.where(melts_all, esd_m, snomlt_raw))
    esd_mlt = jnp.where(gone, 0.0,
                        jnp.where(melts_all, 0.0, esd_m - snomlt_raw))
    esd_sno = jnp.where(frozen12, esd_frz, esd_mlt)
    t1_sno = jnp.where(frozen12, t1_sno_frz, t1_sno_mlt)
    ssoil_sno = jnp.where(frozen12, ssoil_sno_frz, ssoil_sno_mlt)
    ex = jnp.where(frozen12, 0.0, ex_mlt)
    flx3 = jnp.where(frozen12, 0.0, flx3)
    snomlt = jnp.where(snowpack & ~frozen12, snomlt_sno, 0.0)
    prcp1_sno = prcp1_sno + ex

    # --- shared SMFLX ---------------------------------------------------
    prcp1 = jnp.where(snowpack, prcp1_sno, prcp1_no)
    sh2o, smc, cmc, runoff1, runoff2, runoff3, drip = smflx(
        smc, cmc, dt, prcp1, sh2o, slope, kdt, frzx, smcmax, bexp,
        smcwlt, dksat, dwsat, shdfac, edir1, ec1, et1)

    # --- shared SHFLX ---------------------------------------------------
    # NOPAC yy/zz1 (lsm_noahlsm.f90:2000-2015)
    df1_no = tdfcnd(smc[0], quartz, smcmax, sh2o[0])
    df1_no = jnp.where(urban, 3.24, df1_no)
    df1_no = df1_no * jnp.exp(NP.SBETA * shdfac)
    beta_no = jnp.where(etp <= 0.0,
                        jnp.where(etp < 0.0, 1.0, 0.0),
                        eta1 * 1000.0 / jnp.maximum(etp, 1e-20))
    yynum = fdown - emissi * SIGMA * t24
    yy_no = sfctmp + (yynum / rch + th2 - sfctmp - beta_no * epsca) / rr
    zz1_no = df1_no / (-0.5 * ZSOIL[0] * rch * rr) + 1.0
    # SNOPAC yy/zz1 (lsm_noahlsm.f90:3140-3165)
    yy_sno = stc[0] - 0.5 * ssoil_sno * ZSOIL[0] * 1.0 / df1
    yy = jnp.where(snowpack, yy_sno, yy_no)
    zz1 = jnp.where(snowpack, 1.0, zz1_no)
    df1_eff = jnp.where(snowpack, df1, df1_no)
    csoil_loc = jnp.where(urban, 3.0e6, NP.CSOIL)

    stc, sh2o = hrt_hstep(stc, smc, sh2o, smcmax, yy, zz1, tbot, NP.ZBOT,
                          psisat, dt, bexp, df1_eff, quartz, csoil_loc)

    # skin temperature + soil heat flux (SHFLX tail, :2480-2492)
    t1_no = (yy_no + (zz1_no - 1.0) * stc[0]) / zz1_no
    ssoil_no = df1_no * (stc[0] - t1_no) / (0.5 * ZSOIL[0])
    t1 = jnp.where(snowpack, t1_sno, t1_no)
    ssoil = jnp.where(snowpack, ssoil_sno, ssoil_no)
    sneqv = jnp.where(snowpack, esd_sno, sneqv)

    # snow compaction / removal (SNOPAC tail, :3180-3200)
    has_snow = snowpack & (sneqv > 0.)
    snowh_c, sndens_c = snowpack_compact(sneqv, dt, snowh, sndens,
                                         t1, yy)
    snowh = jnp.where(has_snow, snowh_c,
                      jnp.where(snowpack, 0.0, snowh))
    sndens = jnp.where(has_snow, sndens_c,
                       jnp.where(snowpack, 0.0, sndens))
    sncovr = jnp.where(snowpack & ~has_snow, 0.0, sncovr)

    # --- final flux accounting (SFLX tail, :775-855) --------------------
    etns = etns1 * 1000.0
    eta_kinematic = jnp.where(snowpack, esnow + etns, eta1 * 1000.0)
    flx1 = jnp.where(snowpack, flx1_sno,
                     CPH2O * prcp * (t1 - sfctmp))
    flx3 = jnp.where(snowpack, flx3, 0.0)
    q1 = q2 + eta_kinematic * CP / rch
    sheat = -(ch * CP * sfcprs) / (R * t2v) * (th2 - t1)

    edir = edir1 * 1000.0 * LVH2O
    ec = ec1 * 1000.0 * LVH2O
    ett = jnp.sum(et1, axis=0) * 1000.0 * LVH2O
    esnow_w = esnow * LSUBS
    etp_w = etp * ((1. - sncovr) * LVH2O + sncovr * LSUBS)
    eta = jnp.where(etp_w > 0., edir + ec + ett + esnow_w, etp_w)
    beta = jnp.where(etp_w == 0.0, 0.0, eta / etp_w)
    ssoil = -1.0 * ssoil
    runoff3 = runoff3 / dt
    runoff2 = runoff2 + runoff3
    soilm = jnp.sum(smc * jnp.asarray(NP.DZS, smc.dtype)[:, None, None],
                    axis=0)

    return dict(cmc=cmc, t1=t1, stc=stc, smc=smc, sh2o=sh2o, snowh=snowh,
                sneqv=sneqv, sncovr=sncovr, albedo=albedo, emissi=emissi,
                z0=z0, snotime1=snotime1, eta=eta, sheat=sheat,
                eta_kinematic=eta_kinematic, etp=etp_w, ssoil=ssoil,
                runoff1=runoff1, runoff2=runoff2, snomlt=snomlt, q1=q1,
                soilm=soilm, beta=beta, drip=drip, flx1=flx1, flx2=flx2,
                flx3=flx3)


# ---------------------------------------------------------------------------
# grid driver (lsm_noah, lsm_noahdrv.f90:36-1018 + lsm_driver.f90 glue)
# ---------------------------------------------------------------------------

def sat_spec_hum(t, p):
    """Saturation specific humidity via the driver's A2/A3/A4 form
    (lsm_noahdrv.f90:401 + sat_mr)."""
    from .mp_simple import sat_mr
    mr = sat_mr(t, p)
    return mr / (1.0 + mr)


def noah_driver(tables, dz0, qv0, p_i0, p_i1, t0, exner0, psfc, tsk, chs,
                glw, swdown, albedo_prev, emiss_prev, precip_delta, dt,
                vegtyp, soiltyp, shdfac, snoalb, tbot, land,
                cmc, stc, smc, sh2o, sneqv_mm, snowh, sncovr_prev,
                snotime1, z0brd_state):
    """Per-step Noah over the grid (lsm_noah, lsm_noahdrv.f90:612-1010).

    dz0/qv0/t0/exner0: lowest-layer atmosphere; p_i0/p_i1 interface
    pressures below/above it; precip_delta [kg m-2] since last call;
    chs: conductance [m/s] (already multiplied by wind speed);
    sneqv_mm: SWE in mm. `land` is a boolean mask; non-land cells pass
    through unchanged.

    Returns dict of updated fields + fluxes (hfx, qfx [kg m-2 s-1], lh).
    """
    A2, A3, A4 = 17.67, 273.15, 29.65
    A23M4 = A2 * (A3 - A4)

    psfc_eff = p_i0
    sfcprs = 0.5 * (p_i0 + p_i1)
    q2k = qv0 / (1.0 + qv0)
    sfctmp = t0
    zlvl = 0.5 * dz0
    capa = RD / CP
    apes = (1e5 / psfc_eff) ** capa
    apelm = (1e5 / sfcprs) ** capa
    th2 = sfctmp * apelm / apes

    emissi = emiss_prev
    lwdn = glw * emissi
    soldn = swdown
    solnet = soldn * (1. - albedo_prev)
    prcp = precip_delta / dt

    q2sat_mr_t2 = sat_spec_hum(sfctmp, sfcprs)
    q2sat = q2sat_mr_t2
    dqsdt2 = q2sat * A23M4 / (sfctmp - A4) ** 2

    # snow-on-ground saturation adjustments (lsm_noahdrv.f90:744-762)
    snow_mask = sneqv_mm > 0.0
    e2sat = 611.2 * jnp.exp(6174. * (1. / 273.15 - 1. / sfctmp))
    q2sati = 0.622 * e2sat / (sfcprs - e2sat)
    q2sati = q2sati / (1.0 + q2sati)
    warm_gr = tsk > 273.14
    q2sat = jnp.where(snow_mask,
                      jnp.where(warm_gr,
                                q2sat * (1. - sncovr_prev)
                                + q2sati * sncovr_prev, q2sati), q2sat)
    dqsdt2_sno = jnp.where(warm_gr,
                           dqsdt2 * (1. - sncovr_prev)
                           + q2sati * 6174. / sfctmp ** 2 * sncovr_prev,
                           q2sati * 6174. / sfctmp ** 2)
    dqsdt2 = jnp.where(snow_mask, dqsdt2_sno, dqsdt2)
    dqsdt2 = jnp.where(snow_mask & (tsk > 273.) & (sncovr_prev > 0.),
                       dqsdt2 * (1. - sncovr_prev), dqsdt2)

    ffrozp = jnp.where(sfctmp <= 273.15, 1.0, 0.0)
    # re-derive snow depth when missing or thinner than its own SWE
    # (lsm_noahdrv.f90:803-806)
    sneqv_m = sneqv_mm * 0.001
    snowh = jnp.where(((sneqv_m != 0.) & (snowh == 0.))
                      | (snowh <= sneqv_m), 5.0 * sneqv_m, snowh)
    soiltyp = jnp.where((soiltyp == 14), 7, soiltyp)   # water soil on land
    shdfac = jnp.where((vegtyp == 25) | (vegtyp == 26) | (vegtyp == 27),
                       0.0, shdfac)
    glacier = vegtyp == NP.ISICE

    out = sflx(tables, ffrozp, dt, zlvl, lwdn, soldn, solnet, sfcprs,
               prcp, sfctmp, q2k, th2, q2sat, dqsdt2, vegtyp, soiltyp,
               shdfac, albedo_prev, snoalb, tbot, chs, cmc, tsk, stc,
               smc, sh2o, snowh, sneqv_m, snotime1)

    apply = land & ~glacier

    def sel2(new, old):
        return jnp.where(apply, new, old)

    def sel3(new, old):
        return jnp.where(apply[None], new, old)

    q1 = out["q1"]
    qsfc_mr = q1 / (1.0 - q1)
    return dict(
        skin_temperature=sel2(out["t1"], tsk),
        canopy_water=sel2(out["cmc"], cmc),
        swe=sel2(out["sneqv"] * 1000.0, sneqv_mm),
        snow_height=sel2(out["snowh"], snowh),
        snow_cover=sel2(out["sncovr"], sncovr_prev),
        albedo=sel2(out["albedo"], albedo_prev),
        emissivity=sel2(out["emissi"], emiss_prev),
        roughness=sel2(out["z0"], z0brd_state),
        snotime=sel2(out["snotime1"], snotime1),
        soil_temperature=sel3(out["stc"], stc),
        soil_water_content=sel3(out["smc"], smc),
        soil_liquid_water=sel3(out["sh2o"], sh2o),
        hfx=jnp.where(apply, out["sheat"], 0.0),
        qfx=jnp.where(apply, out["eta_kinematic"], 0.0),
        lh=jnp.where(apply, out["eta"], 0.0),
        ground_heat_flux=jnp.where(apply, out["ssoil"], 0.0),
        qsfc=jnp.where(apply, qsfc_mr, qv0),
        runoff_surface=jnp.where(apply, out["runoff1"] * dt * 1000.0,
                                 0.0),
        runoff_subsurface=jnp.where(apply, out["runoff2"] * dt * 1000.0,
                                    0.0),
        snowmelt=jnp.where(apply, out["snomlt"] * 1000.0, 0.0),
    )
