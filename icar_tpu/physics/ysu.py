"""YSU nonlocal planetary-boundary-layer scheme (Hong, Noh & Dudhia 2006).

JAX re-implementation of /root/reference/src/physics/pbl_ysu.f90 (ysu2d)
and the surface-layer similarity routine it depends on
(pbl_utilities.f90:69-544 da_sfc_wtq), as driven by pbl_driver.f90:223-346.

Vectorization notes:
  * the sequential bulk-Richardson PBL-height scans become unrolled masked
    sweeps over the (static) vertical levels;
  * the implicit vertical diffusion solve (tridin, pbl_ysu.f90:1154-1234)
    becomes a vectorized Thomas algorithm over all columns at once;
  * parity quirk preserved: ICAR computes but DISCARDS the momentum
    tendencies (pbl_driver.f90:336-341 are commented out), so the momentum
    tridiagonal solve is skipped entirely here — same model evolution,
    less compute.

Columns are the trailing (ny, nx) dims; z is axis 0; the lowest level is
index 0. ``nzt = nz - 1`` levels are diffused (the driver passes kte-1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.indexing import take_level
import numpy as np

from .. import constants as C

# scheme parameters (pbl_ysu.f90:316-337)
XKZMIN, XKZMAX = 0.01, 1000.0
RIMIN = -100.0
RLAM = 30.0
PRMIN, PRMAX = 0.25, 4.0
BRCR_UB, BRCR_SB = 0.0, 0.25
CORI = 1e-4
AFAC = 6.8
BFAC = 6.8
PFAC = 2.0
PHIFAC = 8.0
SFCFRAC = 0.1
D1, D2, D3 = 0.02, 0.05, 0.001
H1, H2 = 0.33333335, 0.6666667
CKZ = 0.001
ZFMIN = 1e-8
APHI5, APHI16 = 5.0, 16.0
TMIN = 1e-2
GAMCRT, GAMCRQ = 3.0, 2e-3


# ---------------------------------------------------------------------------
# surface-layer similarity (da_sfc_wtq)
# ---------------------------------------------------------------------------


class SurfaceLayer(NamedTuple):
    psim: jnp.ndarray
    psih: jnp.ndarray
    regime: jnp.ndarray
    u10: jnp.ndarray
    v10: jnp.ndarray
    t2: jnp.ndarray
    q2: jnp.ndarray


def _sat_q(t, p):
    """Saturated specific humidity (da_tp_to_qs equivalent)."""
    es = 611.2 * jnp.exp(17.67 * (t - 273.15) / (t - 29.65))
    qs = 0.622 * es / (p - 0.378 * es)
    return qs


def surface_layer(psfc, tg, ps1, ts1, qs1, us1, vs1, hs, roughness, xland,
                  dx, ust, hfx, qfx):
    """Similarity stability functions + 10m/2m diagnostics (da_sfc_wtq,
    pbl_utilities.f90:69-544). ``xland``: 1=land, 2=water. ``ust`` is the
    externally supplied friction velocity (use_ust_wrf path)."""
    rcp = C.RD / C.CP
    k_kar = 0.4
    ka = 2.4e-5

    z0 = jnp.maximum(roughness, 0.0001)
    zq0 = jnp.where(xland >= 1.5, z0, 0.01)
    gzsoz0 = jnp.log(hs / z0)
    gz10oz0 = jnp.log(10.0 / z0)
    gz2oz0 = jnp.log(2.0 / z0)

    tvs = ts1 * (1.0 + 0.608 * qs1)
    qg_s = _sat_q(tg, psfc)
    qg = qg_s * (1.0 - qg_s)       # specific humidity -> mixing ratio
    tvg = tg * (1.0 + 0.608 * qg)
    ths = ts1 * (1000.0 / (ps1 / 100.0)) ** rcp
    thg = tg * (1000.0 / (psfc / 100.0)) ** rcp
    thvs = tvs * (1000.0 / (ps1 / 100.0)) ** rcp
    thvg = tvg * (1000.0 / (psfc / 100.0)) ** rcp

    va2 = us1 ** 2 + vs1 ** 2
    vc2 = jnp.maximum(thvg - thvs, 0.0)
    vsgd = 0.32 * jnp.maximum(dx / 5000.0 - 1.0, 0.0) ** 0.33
    wspd = jnp.maximum(jnp.sqrt(va2 + vc2 + vsgd * vsgd), 0.1)
    v2 = wspd * wspd

    rib = (C.GRAVITY * hs / ths) * (thvs - thvg) / v2
    mol = k_kar * (ths - thg) / gzsoz0

    # regimes (pbl_utilities.f90:325-343)
    regime = jnp.where(rib >= 0.2, 1.1,
                       jnp.where(rib > 0.0, 2.1,
                                 jnp.where(rib == 0.0, 3.1, 4.1)))

    # psi per regime
    psim_1 = jnp.maximum(-10.0 * gzsoz0, -10.0)
    psim_2 = jnp.maximum((-5.0 * rib) * gzsoz0 / (1.1 - 5.0 * rib), -10.0)
    # free convection (regime 4)
    cc = 2.0 * jnp.arctan(jnp.ones_like(rib))
    hol = jnp.where(ust < 0.01, rib * gzsoz0,
                    k_kar * C.GRAVITY * hs * mol / (ths * ust * ust))
    hol = jnp.clip(hol, -9.9999, 0.0)
    holz = jnp.clip((10.0 / hs) * hol, -9.9999, 0.0)
    hol2 = jnp.clip((2.0 / hs) * hol, -9.9999, 0.0)

    def psi_unstable(h):
        xx = (1.0 - 16.0 * h) ** 0.25
        yy = jnp.log((1.0 + xx * xx) / 2.0)
        psim = 2.0 * jnp.log((1.0 + xx) / 2.0) + yy - 2.0 * jnp.arctan(xx) + cc
        psih = 2.0 * yy
        return psim, psih

    psim_4, psih_4 = psi_unstable(hol)
    psimz4, psihz4 = psi_unstable(holz)
    psim24, psih24 = psi_unstable(hol2)
    psim_4 = jnp.minimum(psim_4, 0.9 * gzsoz0)
    psih_4 = jnp.minimum(psih_4, 0.9 * gzsoz0)
    psimz4 = jnp.minimum(psimz4, 0.9 * gz10oz0)
    psihz4 = jnp.minimum(psihz4, 0.9 * gz10oz0)
    psim24 = jnp.minimum(psim24, 0.9 * gz2oz0)
    psih24 = jnp.minimum(psih24, 0.9 * gz2oz0)

    r1 = jnp.round(regime) == 1
    r2 = jnp.round(regime) == 2
    r3 = jnp.round(regime) == 3
    psim = jnp.where(r1, psim_1, jnp.where(r2, psim_2,
                                           jnp.where(r3, 0.0, psim_4)))
    psih = jnp.where(r1 | r2, psim, jnp.where(r3, 0.0, psih_4))
    psimz = jnp.where(r1 | r2, jnp.maximum(10.0 / hs * psim, -10.0),
                      jnp.where(r3, 0.0, psimz4))
    psih2 = jnp.where(r1 | r2, jnp.maximum(2.0 / hs * psim, -10.0),
                      jnp.where(r3, 0.0, psih24))

    psiw = gzsoz0 - psim
    psiz = gz10oz0 - psimz
    psit = jnp.maximum(gzsoz0 - psih, 2.0)
    psit2 = gz2oz0 - psih2
    psiq = jnp.log(k_kar * ust * hs / ka + hs / zq0) - psih
    psiq2 = jnp.log(k_kar * ust * 2.0 / ka + 2.0 / zq0) - psih2

    # over water: viscous sublayer roughness (pbl_utilities.f90:489-503)
    visc = (1.32 + 0.009 * (ts1 - 273.15)) * 1e-5
    restar = ust * z0 / jnp.maximum(visc, 1e-10)
    z0t = jnp.clip(5.5e-5 * jnp.maximum(restar, 1e-10) ** (-0.60),
                   2e-9, 1e-4)
    water = xland >= 1.5
    psiq = jnp.where(water,
                     jnp.maximum(jnp.log((hs + z0t) / z0t) - psih, 2.0), psiq)
    psit_w = jnp.maximum(jnp.log((hs + z0t) / z0t) - psih, 2.0)
    psit = jnp.where(water, psit_w, psit)
    psiq2 = jnp.where(water,
                      jnp.maximum(jnp.log((2.0 + z0t) / z0t) - psih2, 2.0),
                      psiq2)
    psit2 = jnp.where(water,
                      jnp.maximum(jnp.log((2.0 + z0t) / z0t) - psih2, 2.0),
                      psit2)

    u10 = us1 * psiz / psiw
    v10 = vs1 * psiz / psiw
    # has_lsm flux-based 2m diagnostics (pbl_utilities.f90:517-541)
    cqs2 = ust * k_kar / psiq2
    chs2 = jnp.where(water, ust * k_kar / psit2, cqs2)
    rho = psfc / (C.RD * tg)
    q2 = jnp.where(cqs2 < 1e-5, qg, qg - qfx / (rho * cqs2))
    t2 = jnp.where(chs2 < 1e-5, tg, tg - hfx / (rho * C.CP * chs2))
    return SurfaceLayer(psim, psih, regime, u10, v10, t2, q2)


# ---------------------------------------------------------------------------
# the PBL scheme (ysu2d)
# ---------------------------------------------------------------------------


def _pbl_height_scan(thvx, thermal, ux, vx, za, br0, brcr, active, klpbl):
    """Sequential bulk-Richardson PBL-top search (pbl_ysu.f90:626-652 and
    repeats) as an unrolled masked sweep. Returns (kpbl, brdn, brup)."""
    stable = ~active
    brup = br0
    brdn = jnp.zeros_like(br0)
    kpbl = jnp.ones_like(br0, dtype=jnp.int32)
    g_over_thv1 = C.GRAVITY / thvx[0]
    for k in range(1, klpbl):
        upd = ~stable
        spdk2 = jnp.maximum(ux[k] ** 2 + vx[k] ** 2, 1.0)
        brup_new = (thvx[k] - thermal) * (g_over_thv1 * za[k]) / spdk2
        brdn = jnp.where(upd, brup, brdn)
        brup = jnp.where(upd, brup_new, brup)
        kpbl = jnp.where(upd, k, kpbl)
        stable = stable | (upd & (brup > brcr))
    return kpbl, brdn, brup


def _interp_hpbl(kpbl, brdn, brup, brcr, za):
    """hpbl from the bracketing Richardson values (pbl_ysu.f90:654-666)."""
    brint = jnp.where(brdn >= brcr, 0.0,
                      jnp.where(brup <= brcr, 1.0,
                                (brcr - brdn) / jnp.where(brup == brdn, 1.0,
                                                          brup - brdn)))
    za_km1 = take_level(za, jnp.maximum(kpbl - 1, 0))
    za_k = take_level(za, kpbl)
    return za_km1 + brint * (za_k - za_km1)


def _tridiag_solve(lower, diag, upper, rhs_list, nzt):
    """Vectorized Thomas algorithm matching tridin (pbl_ysu.f90:1154-1234).
    lower[k] multiplies x[k-1] in row k; upper[k] multiplies x[k+1]."""
    au = [None] * nzt
    fs = [[None] * nzt for _ in rhs_list]
    fk = 1.0 / diag[0]
    au[0] = fk * upper[0]
    for n, r in enumerate(rhs_list):
        fs[n][0] = fk * r[0]
    for k in range(1, nzt):
        fk = 1.0 / (diag[k] - lower[k] * au[k - 1])
        au[k] = fk * upper[k] if k < nzt - 1 else None
        for n, r in enumerate(rhs_list):
            fs[n][k] = fk * (r[k] - lower[k] * fs[n][k - 1])
    for k in range(nzt - 2, -1, -1):
        for n in range(len(rhs_list)):
            fs[n][k] = fs[n][k] - au[k] * fs[n][k + 1]
    return [jnp.stack(f) for f in fs]


def ysu(ux, vx, th, t, qv, qc, qi, p, p_i, exner, dz8w, z, terrain, psfc,
        tsk, znt, xland, hfx, qfx, ust, u10, v10, psim, psih, br, dt):
    """One YSU step (ysu2d, pbl_ysu.f90:266-1152), scalar tendencies applied
    (pbl_driver.f90:343-346; momentum tendencies intentionally dropped as in
    the reference driver). All 3D args (nz, ny, nx); 2D args (ny, nx).

    Returns (th, qv, qc, qi, hpbl, kpbl, exch_h)."""
    nz = th.shape[0]
    nzt = nz - 1                      # levels diffused (driver passes kte-1)
    klpbl = nzt
    karman = C.KARMAN
    # WRF initializes ust to 1e-4; domain-boundary cells arrive with the
    # diagnostic ustar unset (=0), which would zero wscale and NaN the
    # countergradient terms
    ust = jnp.maximum(ust, 1e-4)

    thx = th
    tvcon = 1.0 + C.EP1 * qv
    thvx = thx * tvcon
    rhox = psfc / (C.RD * t[0])
    govrth = C.GRAVITY / thx[0]
    cpm = C.CP * (1.0 + 0.8 * qv[0])

    # heights above ground (zq at interfaces incl. surface=0)
    zq = jnp.concatenate([jnp.zeros_like(dz8w[:1]),
                          jnp.cumsum(dz8w, axis=0)], axis=0)   # (nz+1, ...)
    za = 0.5 * (zq[:-1] + zq[1:])
    del_p = p_i[:-1] - p_i[1:]        # (nz-1, ...) layer pressure thickness
    dza = jnp.concatenate([za[:1], za[1:] - za[:-1]], axis=0)
    zl1 = za[0]

    dt2 = 2.0 * dt
    rdt = 1.0 / dt2

    sfcflg = br <= 0.0
    thermal0 = thvx[0]

    # first guess of pbl height (pbl_ysu.f90:626-666)
    kpbl, brdn, brup = _pbl_height_scan(
        thvx, thermal0, ux, vx, za, br, BRCR_UB,
        jnp.ones_like(br, bool), klpbl)
    hpbl = _interp_hpbl(kpbl, brdn, brup, BRCR_UB, za)
    kpbl = jnp.where(hpbl < zq[1], 1, kpbl)
    pblflg = kpbl > 1

    # surface scales (pbl_ysu.f90:668-696)
    fm = jnp.log(za[0] / jnp.maximum(znt, 1e-4)) - psim
    fh = jnp.log(za[0] / jnp.maximum(znt, 1e-4)) - psih
    hol = jnp.maximum(br * fm * fm / jnp.where(fh == 0, 1e-10, fh), RIMIN)
    hol = jnp.where(sfcflg, jnp.minimum(hol, -ZFMIN), jnp.maximum(hol, ZFMIN))
    hol1 = hol * hpbl / zl1 * SFCFRAC
    phim = jnp.where(sfcflg, (1.0 - APHI16 * hol1) ** (-0.25),
                     1.0 + APHI5 * hol1)
    phih = jnp.where(sfcflg, (1.0 - APHI16 * hol1) ** (-0.5), phim)
    bfx0 = jnp.maximum(hfx / rhox / cpm + C.EP1 * thx[0] * qfx / rhox, 0.0)
    wstar3 = jnp.where(sfcflg, govrth * bfx0 * hpbl, 0.0)
    wstar = wstar3 ** H1
    ust3 = ust ** 3
    wscale = (ust3 + PHIFAC * karman * wstar3 * 0.5) ** H1
    wscale = jnp.clip(wscale, ust / APHI5, ust * APHI16)

    # countergradient terms + thermal excess (pbl_ysu.f90:698-716)
    wspd1 = jnp.sqrt(ux[0] ** 2 + vx[0] ** 2) + 1e-9
    gamfac = BFAC / rhox / wscale
    hgamt = jnp.where(sfcflg,
                      jnp.clip(gamfac * hfx / cpm, 0.0, GAMCRT), 0.0)
    hgamq = jnp.where(sfcflg, jnp.clip(gamfac * qfx, 0.0, GAMCRQ), 0.0)
    vpert = (hgamt + C.EP1 * thx[0] * hgamq) / BFAC * AFAC
    thermal = thermal0 + jnp.where(sfcflg, jnp.maximum(vpert, 0.0), 0.0)
    pblflg = pblflg & sfcflg

    # enhanced pbl height with thermal excess (pbl_ysu.f90:718-760)
    kpbl2, brdn2, brup2 = _pbl_height_scan(
        thvx, thermal, ux, vx, za, br, BRCR_UB, pblflg, klpbl)
    hpbl2 = _interp_hpbl(kpbl2, brdn2, brup2, BRCR_UB, za)
    kpbl = jnp.where(pblflg, kpbl2, kpbl)
    hpbl = jnp.where(pblflg, hpbl2, hpbl)
    kpbl = jnp.where(pblflg & (hpbl < zq[1]), 1, kpbl)
    pblflg = pblflg & (kpbl > 1)

    # stable boundary layer height (pbl_ysu.f90:762-813)
    need_sbl = (~sfcflg) & (hpbl < zq[1])
    wspd10 = jnp.sqrt(u10 ** 2 + v10 ** 2)
    ross = wspd10 / (CORI * jnp.maximum(znt, 1e-6))
    brcr_sbro = jnp.minimum(0.16 * (1e-7 * jnp.maximum(ross, 1e-10))
                            ** (-0.18), 0.3)
    brcr_sb = jnp.where(xland >= 1.5, brcr_sbro, BRCR_SB)
    kpbl3, brdn3, brup3 = _pbl_height_scan(
        thvx, thermal, ux, vx, za, br, brcr_sb, need_sbl, klpbl)
    hpbl3 = _interp_hpbl(kpbl3, brdn3, brup3, brcr_sb, za)
    kpbl = jnp.where(need_sbl, kpbl3, kpbl)
    hpbl = jnp.where(need_sbl, hpbl3, hpbl)
    kpbl = jnp.where(need_sbl & (hpbl < zq[1]), 1, kpbl)
    pblflg = pblflg & jnp.where(need_sbl, kpbl > 1, True)

    # entrainment parameters (pbl_ysu.f90:815-850)
    km1 = jnp.maximum(kpbl - 1, 0)

    def gat(a, kk):
        return take_level(a, kk)

    wm3 = wstar3 + 5.0 * ust3
    wm2 = wm3 ** H2
    bfxpbl = -0.15 * thvx[0] / C.GRAVITY * wm3 / jnp.maximum(hpbl, 1.0)
    dthvx = jnp.maximum(gat(thvx, km1 + 1) - gat(thvx, km1), TMIN)
    dthx = jnp.maximum(gat(thx, km1 + 1) - gat(thx, km1), TMIN)
    dqx = jnp.minimum(gat(qv, km1 + 1) - gat(qv, km1), 0.0)
    we = jnp.maximum(bfxpbl / dthvx, -jnp.sqrt(wm2))
    hfxpbl = we * dthx
    qfxpbl = we * dqx
    delb = govrth * D3 * hpbl
    delta = jnp.minimum(D1 * hpbl + D2 * wm2 / jnp.maximum(delb, 1e-10),
                        100.0)
    zero_when_no_pbl = lambda a: jnp.where(pblflg, a, 0.0)
    hfxpbl = zero_when_no_pbl(hfxpbl)
    qfxpbl = zero_when_no_pbl(qfxpbl)

    karr = jnp.arange(nzt)[:, None, None]
    in_pbl = pblflg[None] & (karr < kpbl[None])
    entfac = jnp.where(pblflg[None] & (karr >= kpbl[None]),
                       ((zq[1:nzt + 1] - hpbl[None]) /
                        jnp.maximum(delta[None], 1e-10)) ** 2, 1e30)

    # diffusivities below pbl top (pbl_ysu.f90:852-876)
    zfac = jnp.clip(1.0 - (zq[1:nzt + 1] - zl1[None])
                    / jnp.maximum(hpbl[None] - zl1[None], 1e-10), ZFMIN, 1.0)
    xkzo = CKZ * dza[1:nzt + 1]
    zfacent = (1.0 - zfac) ** 3
    prnumfac = -3.0 * jnp.maximum(zq[1:nzt + 1]
                                  - SFCFRAC * hpbl[None], 0.0) ** 2 \
        / jnp.maximum(hpbl[None], 1.0) ** 2
    prnum0 = (phih / phim + BFAC * karman * SFCFRAC)
    prnum = 1.0 + (prnum0[None] - 1.0) * jnp.exp(prnumfac)
    prnum = jnp.clip(prnum, PRMIN, PRMAX)
    wscalek = (ust3[None] + PHIFAC * karman * wstar3[None]
               * (1.0 - zfac)) ** H1
    xkzm_pbl = xkzo + wscalek * karman * zq[1:nzt + 1] * zfac ** PFAC
    xkzh_pbl = xkzm_pbl / prnum
    xkzm_pbl = jnp.clip(xkzm_pbl, XKZMIN, XKZMAX)
    xkzh_pbl = jnp.clip(xkzh_pbl, XKZMIN, XKZMAX)

    # free-atmosphere diffusivities (pbl_ysu.f90:878-930)
    du = ux[1:nzt + 1] - ux[:nzt]
    dv = vx[1:nzt + 1] - vx[:nzt]
    dzap = dza[1:nzt + 1]
    ss = (du * du + dv * dv) / (dzap * dzap) + 1e-9
    govrthv = C.GRAVITY / (0.5 * (thvx[1:nzt + 1] + thvx[:nzt]))
    ri = govrthv * (thvx[1:nzt + 1] - thvx[:nzt]) / (ss * dzap)
    # moist adiabatic correction inside cloud (imvdif)
    cloudy = ((qc[:nzt] + qi[:nzt]) > 0.01e-3) \
        & ((qc[1:nzt + 1] + qi[1:nzt + 1]) > 0.01e-3)
    qmean = 0.5 * (qv[:nzt] + qv[1:nzt + 1])
    tmean = 0.5 * (t[:nzt] + t[1:nzt + 1])
    alph = C.LH_VAPORIZATION * qmean / C.RD / tmean
    chi = (C.LH_VAPORIZATION ** 2) * qmean / C.CP / C.RW / tmean ** 2
    ri_moist = (1.0 + alph) * (ri - C.GRAVITY ** 2 / ss / tmean / C.CP
                               * ((chi - alph) / (1.0 + chi)))
    ri = jnp.where(cloudy, ri_moist, ri)
    zk = karman * zq[1:nzt + 1]
    rl2 = (zk * RLAM / (RLAM + zk)) ** 2
    dk = rl2 * jnp.sqrt(ss)
    sri = jnp.sqrt(jnp.maximum(-ri, 0.0))
    xkzm_free_u = xkzo + dk * (1 + 8.0 * (-ri) / (1 + 1.746 * sri))
    xkzh_free_u = xkzo + dk * (1 + 8.0 * (-ri) / (1 + 1.286 * sri))
    xkzh_free_s = xkzo + dk / (1 + 5.0 * ri) ** 2
    prnum_s = jnp.minimum(1.0 + 2.1 * ri, PRMAX)
    xkzm_free_s = (xkzh_free_s - xkzo) * prnum_s + xkzo
    unstable_f = ri < 0
    xkzm_free = jnp.where(unstable_f, xkzm_free_u, xkzm_free_s)
    xkzh_free = jnp.where(unstable_f, xkzh_free_u, xkzh_free_s)
    xkzm_free = jnp.clip(xkzm_free, XKZMIN, XKZMAX)
    xkzh_free = jnp.clip(xkzh_free, XKZMIN, XKZMAX)

    xkzh = jnp.where(in_pbl, xkzh_pbl, xkzh_free)
    # entrainment-layer blending (pbl_ysu.f90:986-990). NOTE reference
    # quirk preserved: tem1 (and hence the heat matrix) is computed from
    # xkzh BEFORE this overwrite, so the blended value only reaches the
    # exch_h diagnostic (and the discarded momentum path).
    ent_layer = pblflg[None] & (karr >= kpbl[None]) & (entfac < 4.6)
    dza_kpbl = gat(dza, kpbl)
    xkzh_ent = jnp.sqrt(jnp.maximum(
        -we[None] * dza_kpbl[None] * jnp.exp(-entfac), 0.0) * xkzh_free)
    xkzh_ent = jnp.clip(xkzh_ent, XKZMIN, XKZMAX)
    xkzh_out = jnp.where(ent_layer, xkzh_ent, xkzh)

    # ---- implicit diffusion matrix for heat/moisture (pbl_ysu.f90:932-1010)
    dtodsd = dt2 / del_p[:nzt]
    dtodsu_shift = dt2 / jnp.concatenate(
        [del_p[1:nzt], del_p[nzt - 1:nzt]], axis=0)   # del at k+1 (k<nzt-1)
    dsig = p[:nzt] - p[1:nzt + 1]
    rdz = 1.0 / dza[1:nzt + 1]
    tem1 = dsig * xkzh * rdz
    dsdzt = jnp.where(in_pbl,
                      tem1 * (-hgamt[None] / jnp.maximum(hpbl[None], 1.0)
                              - hfxpbl[None] * zfacent
                              / jnp.maximum(xkzh, XKZMIN)), 0.0)
    dsdzq = jnp.where(in_pbl,
                      tem1 * (-qfxpbl[None] * zfacent
                              / jnp.maximum(xkzh, XKZMIN)), 0.0)
    dsdz2 = tem1 * rdz
    au_f = -dtodsd * dsdz2            # faces k = 0..nzt-1 (face above lvl k)
    al_f = -dtodsu_shift * dsdz2

    # rhs
    f1 = thx[:nzt] - 300.0
    f1 = f1.at[0].add(hfx / (rhox * cpm) / zq[1] * dt2)
    fq = qv[:nzt]
    fq = fq.at[0].add(qfx / rhox / zq[1] * dt2)
    # countergradient/entrainment source terms at faces k < nzt-1
    face = slice(0, nzt - 1)
    f1 = f1.at[:nzt - 1].add(dtodsd[face] * dsdzt[face])
    f1 = f1.at[1:nzt].add(-dtodsu_shift[face] * dsdzt[face])
    fq = fq.at[:nzt - 1].add(dtodsd[face] * dsdzq[face])
    fq = fq.at[1:nzt].add(-dtodsu_shift[face] * dsdzq[face])
    fc = qc[:nzt]
    fi = qi[:nzt]

    # tridiagonal coefficients: row k has lower al_f[k-1], upper au_f[k]
    zero2 = jnp.zeros_like(au_f[:1])
    lower = jnp.concatenate([zero2, al_f[:nzt - 1]], axis=0)
    upper = jnp.concatenate([au_f[:nzt - 1], zero2], axis=0)
    diag = 1.0 - lower - upper

    f1s, fqs, fcs, fis = _tridiag_solve(lower, diag, upper,
                                        [f1, fq, fc, fi], nzt)

    ttend = (f1s - (thx[:nzt] - 300.0)) * rdt          # potential temp tend
    qtend = (fqs - qv[:nzt]) * rdt
    qctend = (fcs - qc[:nzt]) * rdt
    qitend = (fis - qi[:nzt]) * rdt

    pad = jnp.zeros_like(th[:1])
    th = th + jnp.concatenate([ttend, pad], axis=0) * dt
    qv = qv + jnp.concatenate([qtend, pad], axis=0) * dt
    qc = qc + jnp.concatenate([qctend, pad], axis=0) * dt
    qi = qi + jnp.concatenate([qitend, pad], axis=0) * dt

    exch_h = jnp.concatenate([xkzh_out, jnp.zeros_like(th[:1])], axis=0)
    return th, qv, qc, qi, hpbl, kpbl, exch_h
