"""Morrison 2-moment bulk microphysics (Morrison et al. 2009, MWR).

JAX re-implementation of /root/reference/src/physics/mp_morrison.f90
(MODULE_MP_MORR_TWO_MOMENT, WRFV3.6.1 lineage, ICAR's copy): five
hydrometeor species (cloud droplets, cloud ice, rain, snow, graupel/hail)
with prognostic number concentrations for ice, snow, rain and graupel and
a constant droplet number (INUM=1, NDCNST=250 cm-3 —
mp_morrison.f90:272-278).  The compile-time switches keep the reference's
shipped values: IACT=2, IBASE=2, ISUB=0, ILIQ=0 (ice on), INUC=0
(Cooper/Rasmussen mid-latitude nucleation), IGRAUP=0 (graupel on);
IHAIL is exposed as the ``hail_opt`` argument (mp_morrison.f90:355-361).

Note the reference's own mp_driver stops with "Morrison physics not
re-implemented yet" (mp_driver.f90:213-214) — the scheme is wired here the
way ICAR 1.x wired it, advecting the four number concentrations.

Structure mirrors the column routine MORR_TWO_MOMENT_MICRO
(mp_morrison.f90:925-4049), vectorized over the whole (z, y, x) grid with
masked ``jnp.where`` in place of the per-level GOTO skips:

1. thermodynamic setup + sub-saturation cleanup (":1305-1420")
2. warm-rain (T>=0C) and cold process-rate branches (":1509-2111" /
   ":2121-3305"), each with its own mass-conservation rescaling, blended
   by the temperature mask
3. common liquid saturation adjustment (":2013-2031" = ":3260-3278")
4. CFL-substepped sedimentation with per-column substep counts and the
   "fallspeed below precip" downward propagation (":3341-3584")
5. final instantaneous melting/homogeneous freezing, PSD lambda
   re-clamping and the ice-number cap (":3589-4040")

Layout (z, y, x) float32; level 0 is the surface (KTS).
"""

from __future__ import annotations

from math import gamma as _gamma_f, log, exp, pi

import jax
import jax.numpy as jnp

from .. import constants as Cn

# WRF/ICAR constants (mp_morrison.f90:93-94 via data_structures)
CP = Cn.CP
G = Cn.GRAVITY
R = Cn.RD
RV = Cn.RW
EP_2 = Cn.EP2
PI = pi

# physical constants (MORR_TWO_MOMENT_INIT, mp_morrison.f90:364-470)
AI, AC, AS_, AR = 700.0, 3e7, 11.72, 841.99667
BI, BC, BS, BR = 1.0, 2.0, 0.41, 0.8
RHOSU = 85000.0 / (287.15 * 273.15)
RHOW, RHOI, RHOSN = 997.0, 500.0, 100.0
AIMM, BIMM, ECR = 0.66, 100.0, 1.0
DCS = 125e-6
MI0 = 4.0 / 3.0 * PI * RHOI * (10e-6) ** 3
MG0 = 1.6e-10
F1S, F2S, F1R, F2R = 0.86, 0.28, 0.78, 0.308
QSMALL = 1e-14
EII, ECI = 0.1, 0.7
RIN = 0.1e-6
CPW = 4187.0
CI_, DI = RHOI * PI / 6.0, 3.0
CS_, DS = RHOSN * PI / 6.0, 3.0
DG = 3.0
MMULT = 4.0 / 3.0 * PI * RHOI * (5e-6) ** 3
LAMMAXI, LAMMINI = 1.0 / 1e-6, 1.0 / (2.0 * DCS + 100e-6)
LAMMAXR, LAMMINR = 1.0 / 20e-6, 1.0 / 2800e-6
LAMMAXS, LAMMINS = 1.0 / 10e-6, 1.0 / 2000e-6
LAMMAXG, LAMMING = 1.0 / 20e-6, 1.0 / 2000e-6
NDCNST = 250.0  # cm-3 (mp_morrison.f90:278)


class _Consts:
    """hail_opt-dependent parameters + the CONS1..41 efficiency constants
    (mp_morrison.f90:371-378,385-391,440-482)."""

    def __init__(self, hail_opt: int):
        if hail_opt == 1:
            self.AG, self.BG, self.RHOG = 114.5, 0.5, 900.0
        else:
            self.AG, self.BG, self.RHOG = 19.3, 0.37, 400.0
        AG, BG, RHOG = self.AG, self.BG, self.RHOG
        self.CG = RHOG * PI / 6.0
        g = _gamma_f
        self.CONS1 = g(1.0 + DS) * CS_
        self.CONS2 = g(1.0 + DG) * self.CG
        self.CONS3 = g(4.0 + BS) / 6.0
        self.CONS4 = g(4.0 + BR) / 6.0
        self.CONS5 = g(1.0 + BS)
        self.CONS6 = g(1.0 + BR)
        self.CONS7 = g(4.0 + BG) / 6.0
        self.CONS8 = g(1.0 + BG)
        self.CONS9 = g(5.0 / 2.0 + BR / 2.0)
        self.CONS10 = g(5.0 / 2.0 + BS / 2.0)
        self.CONS11 = g(5.0 / 2.0 + BG / 2.0)
        self.CONS12 = g(1.0 + DI) * CI_
        self.CONS13 = g(BS + 3.0) * PI / 4.0 * ECI
        self.CONS14 = g(BG + 3.0) * PI / 4.0 * ECI
        self.CONS15 = (-1108.0 * EII * PI ** ((1.0 - BS) / 3.0)
                       * RHOSN ** ((-2.0 - BS) / 3.0) / (4.0 * 720.0))
        self.CONS16 = g(BI + 3.0) * PI / 4.0 * ECI
        self.CONS17 = (4.0 * 2.0 * 3.0 * RHOSU * PI * ECI * ECI
                       * g(2.0 * BS + 2.0) / (8.0 * (RHOG - RHOSN)))
        self.CONS18 = RHOSN * RHOSN
        self.CONS19 = RHOW * RHOW
        self.CONS20 = 20.0 * PI * PI * RHOW * BIMM
        self.CONS21 = 4.0 / (DCS * RHOI)
        self.CONS22 = PI * RHOI * DCS ** 3 / 6.0
        self.CONS23 = PI / 4.0 * EII * g(BS + 3.0)
        self.CONS24 = PI / 4.0 * ECR * g(BR + 3.0)
        self.CONS25 = PI * PI / 24.0 * RHOW * ECR * g(BR + 6.0)
        self.CONS26 = PI / 6.0 * RHOW
        self.CONS27 = g(1.0 + BI)
        self.CONS28 = g(4.0 + BI) / 6.0
        self.CONS29 = 4.0 / 3.0 * PI * RHOW * (25e-6) ** 3
        self.CONS31 = PI * PI * ECR * RHOSN
        self.CONS32 = PI / 2.0 * ECR
        self.CONS34 = 5.0 / 2.0 + BR / 2.0
        self.CONS35 = 5.0 / 2.0 + BS / 2.0
        self.CONS36 = 5.0 / 2.0 + BG / 2.0
        self.CONS37 = 4.0 * PI * 1.38e-23 / (6.0 * PI * RIN)
        self.CONS38 = PI * PI / 3.0 * RHOW
        self.CONS39 = PI * PI / 36.0 * RHOW * BIMM
        self.CONS40 = PI / 6.0 * BIMM
        self.CONS41 = PI * PI * ECR * RHOW


_CONSTS = {0: _Consts(0), 1: _Consts(1)}

# Flatau et al. (1992) polynomial saturation vapor pressure
# (POLYSVP, mp_morrison.f90:4053-4119)
_SVP_LIQ = (6.11239921, 0.443987641, 0.142986287e-1, 0.264847430e-3,
            0.302950461e-5, 0.206739458e-7, 0.640689451e-10,
            -0.952447341e-13, -0.976195544e-15)
_SVP_ICE = (6.11147274, 0.503160820, 0.188439774e-1, 0.420895665e-3,
            0.615021634e-5, 0.602588177e-7, 0.385852041e-9,
            0.146898966e-11, 0.252751365e-14)


def polysvp(t, ice: bool):
    """Saturation vapor pressure [Pa] (mp_morrison.f90:4053-4119)."""
    a = _SVP_ICE if ice else _SVP_LIQ
    dt = jnp.maximum(-80.0, t - 273.16)
    p = a[8]
    for c in a[7::-1]:
        p = c + dt * p
    return p * 100.0


def _gam(x):
    """Euler gamma of a traced positive argument (GAMMA,
    mp_morrison.f90:4123)."""
    return jnp.exp(jax.lax.lgamma(x))


def _sd(x, y, eps=1e-35):
    """Safe divide: x/y with a tiny-denominator guard (results are always
    consumed behind threshold masks)."""
    return x / jnp.where(jnp.abs(y) < eps, jnp.where(y < 0, -eps, eps), y)


def _psd(q, n, coef, d, lammin, lammax):
    """Inverse-exponential PSD slope with lambda clamping.

    lam = (coef*n/q)**(1/d); on clamp n is re-derived from
    n0 = lam**4 q / coef (e.g. rain, mp_morrison.f90:1540-1566).
    Returns (lam, n0, n_adjusted) — valid only where q >= QSMALL.
    """
    qs_ = jnp.maximum(q, QSMALL)
    ns_ = jnp.maximum(n, 0.0)
    lam = (coef * ns_ / qs_) ** (1.0 / d)
    clamped = (lam < lammin) | (lam > lammax)
    lam = jnp.clip(lam, lammin, lammax)
    n0_clamp = lam ** 4 * qs_ / coef
    n0 = jnp.where(clamped, n0_clamp, ns_ * lam)
    n_adj = jnp.where(clamped, n0 / lam, ns_)
    return lam, n0, n_adj


def _psd_cloud(qc, nc, t, p, cons26):
    """Droplet gamma-PSD parameters: Martin et al. (1994) shape pgam,
    lamc with diameter clamps (mp_morrison.f90:1570-1607).
    Returns (lamc, pgam, nc_adjusted) — valid where qc >= QSMALL."""
    qs_ = jnp.maximum(qc, QSMALL)
    ns_ = jnp.maximum(nc, 1e-6)
    dum = p / (287.15 * t)
    pgam = 0.0005714 * (ns_ / 1e6 * dum) + 0.2714
    pgam = jnp.clip(1.0 / (pgam * pgam) - 1.0, 2.0, 10.0)
    g1 = _gam(pgam + 1.0)
    g4 = _gam(pgam + 4.0)
    lamc = (cons26 * ns_ * g4 / (qs_ * g1)) ** (1.0 / 3.0)
    lammin = (pgam + 1.0) / 60e-6
    lammax = (pgam + 1.0) / 1e-6
    clamped = (lamc < lammin) | (lamc > lammax)
    lamc = jnp.clip(lamc, lammin, lammax)
    nc_clamp = jnp.exp(3.0 * jnp.log(lamc) + jnp.log(qs_)
                       + jnp.log(g1) - jnp.log(g4)) / cons26
    nc_adj = jnp.where(clamped, nc_clamp, ns_)
    return lamc, pgam, nc_adj


def _fallspeed_limits(rho):
    return (RHOSU / rho) ** 0.54


def mp_morrison(th, qv, qc, qi, qr, qs, qg, ni, ns, nr, ng, exner, p, dz,
                w, dt, rain_acc, snow_acc, graupel_acc, hail_opt: int = 0,
                qrcu=None, qscu=None, qicu=None):
    """One Morrison 2-moment step over the whole grid.

    All 3D fields (z, y, x) with level 0 at the surface; ``dz`` is the mass
    level thickness [m], ``w`` grid-scale vertical velocity [m/s].
    ``rain_acc``/``snow_acc``/``graupel_acc`` are (y, x) accumulators [mm]
    matching RAINNC/SNOWNC/GRAUPELNC (mp_morrison.f90:871-878): rain gets
    the total surface precipitation, snow the ice+snow part, graupel the
    graupel part.

    Returns (th, qv, qc, qi, qr, qs, qg, ni, ns, nr, ng, rain_acc,
    snow_acc, graupel_acc).
    """
    C = _CONSTS[int(hail_opt)]
    f32 = jnp.float32
    zero = jnp.zeros_like(qv)

    t = th * exner
    if qrcu is None:
        qrcu = zero
    if qscu is None:
        qscu = zero
    if qicu is None:
        qicu = zero

    # ---- thermodynamics varying in time/height (":1305-1352") ----------
    xxlv = 3.1484e6 - 2370.0 * t
    xxls = 3.15e6 - 2370.0 * t + 0.3337e6
    cpm = CP * (1.0 + 0.887 * qv)
    xlf = xxls - xxlv

    def _sat(t_, qv_):
        evs = jnp.minimum(0.99 * p, polysvp(t_, False))
        eis = jnp.minimum(0.99 * p, polysvp(t_, True))
        eis = jnp.minimum(eis, evs)
        qvs_ = EP_2 * evs / (p - evs)
        qvi_ = EP_2 * eis / (p - eis)
        return qvs_, qvi_, qv_ / qvs_, qv_ / qvi_

    qvs, qvi, qvqvs, qvqvsi = _sat(t, qv)
    rho = p / (R * t)

    # cumulus detrainment number sources (":1355-1370")
    add_r = qrcu >= 1e-10
    nr = nr + jnp.where(add_r,
                        1.8e5 * (jnp.maximum(qrcu, 0.0) * dt
                                 / (PI * RHOW * rho ** 3)) ** 0.25, 0.0)
    add_s = qscu >= 1e-10
    ns = ns + jnp.where(add_s,
                        3e5 * (jnp.maximum(qscu, 0.0) * dt
                               / (C.CONS1 * rho ** 3)) ** (1.0 / (DS + 1.0)),
                        0.0)
    add_i = qicu >= 1e-10
    ni = ni + jnp.where(add_i, jnp.maximum(qicu, 0.0) * dt
                        / (CI_ * (80e-6) ** DI), 0.0)

    # sub-saturation cleanup of trace water (":1373-1400")
    def _absorb(qx, lheat, cond):
        nonlocal qv, t
        take = cond & (qx < 1e-8)
        qv = qv + jnp.where(take, qx, 0.0)
        t = t - jnp.where(take, qx * lheat / cpm, 0.0)
        return jnp.where(take, 0.0, qx)

    liq_dry = qvqvs < 0.9
    ice_dry = qvqvsi < 0.9
    qr = _absorb(qr, xxlv, liq_dry)
    qc = _absorb(qc, xxlv, liq_dry)
    qi = _absorb(qi, xxls, ice_dry)
    qs = _absorb(qs, xxls, ice_dry)
    qg = _absorb(qg, xxls, ice_dry)

    # QSMALL zeroing (":1405-1430")
    def _zero_small(qx, nx):
        small = qx < QSMALL
        return jnp.where(small, 0.0, qx), jnp.where(small, 0.0, nx)

    nc = zero
    qc, nc = _zero_small(qc, nc)
    qr, nr = _zero_small(qr, nr)
    qi, ni = _zero_small(qi, ni)
    qs, ns = _zero_small(qs, ns)
    qg, ng = _zero_small(qg, ng)

    # air viscosity + density-corrected fallspeed prefactors (":1440-1460")
    mu = 1.496e-6 * t ** 1.5 / (t + 120.0)
    dum54 = _fallspeed_limits(rho)
    ain = (RHOSU / rho) ** 0.35 * AI
    arn = dum54 * AR
    asn = dum54 * AS_
    acn = G * RHOW / (18.0 * mu)  # Stokes droplets
    agn = dum54 * C.AG

    # per-level skip mask (GOTO 200, ":1468-1472")
    any_q = ((qc >= QSMALL) | (qi >= QSMALL) | (qs >= QSMALL)
             | (qr >= QSMALL) | (qg >= QSMALL))
    warm = t >= 273.15
    near_sat = jnp.where(warm, qvqvs >= 0.999, qvqvsi >= 0.999)
    active = any_q | near_sat

    kap = 1.414e3 * mu
    dv = 8.794e-5 * t ** 1.81 / p
    sc = mu / (rho * dv)
    dqsdt = xxlv * qvs / (RV * t * t)
    dqsidt = xxls * qvi / (RV * t * t)
    abi = 1.0 + dqsidt * xxls / cpm
    ab = 1.0 + dqsdt * xxlv / cpm

    # ---- branch-specific pre-mutations ---------------------------------
    warm_act = active & warm
    cold_act = active & ~warm

    # constant droplet number (INUM=1, ":1515-1518")
    nc = jnp.where(active, NDCNST * 1e6 / rho, nc)

    # warm: melt trace snow/graupel into rain (":1523-1537")
    def _melt_small(qx, nx, qr_, nr_, t_):
        melt = warm_act & (qx < 1e-6)
        qr_ = qr_ + jnp.where(melt, qx, 0.0)
        nr_ = nr_ + jnp.where(melt, nx, 0.0)
        t_ = t_ - jnp.where(melt, qx * xlf / cpm, 0.0)
        return jnp.where(melt, 0.0, qx), jnp.where(melt, 0.0, nx), qr_, nr_, t_

    qs, ns, qr, nr, t = _melt_small(qs, ns, qr, nr, t)
    qg, ng, qr, nr, t = _melt_small(qg, ng, qr, nr, t)

    # warm GOTO 300: no condensed water at all (":1539")
    w_nowater = (qc < QSMALL) & (qs < 1e-8) & (qr < QSMALL) & (qg < 1e-8)
    warm_proc = warm_act & ~w_nowater

    ni = jnp.maximum(ni, 0.0)
    ns = jnp.maximum(ns, 0.0)
    nc = jnp.maximum(nc, 0.0)
    nr = jnp.maximum(nr, 0.0)
    ng = jnp.maximum(ng, 0.0)

    # ---- PSD parameters (shared formulas, branch-gated N adjustment) ---
    lamr, n0rr, nr_adj = _psd(qr, nr, PI * RHOW, 3.0, LAMMINR, LAMMAXR)
    lams, n0s, ns_adj = _psd(qs, ns, C.CONS1, DS, LAMMINS, LAMMAXS)
    lamg, n0g, ng_adj = _psd(qg, ng, C.CONS2, DG, LAMMING, LAMMAXG)
    lami, n0i, ni_adj = _psd(qi, ni, C.CONS12, DI, LAMMINI, LAMMAXI)
    lamc, pgam, nc_adj = _psd_cloud(qc, nc, t, p, C.CONS26)

    psd_gate = warm_proc | cold_act
    nr = jnp.where(psd_gate & (qr >= QSMALL), nr_adj, nr)
    ns = jnp.where(psd_gate & (qs >= QSMALL), ns_adj, ns)
    ng = jnp.where(psd_gate & (qg >= QSMALL), ng_adj, ng)
    nc = jnp.where(psd_gate & (qc >= QSMALL), nc_adj, nc)
    ni = jnp.where(cold_act & (qi >= QSMALL), ni_adj, ni)
    # lami stays 0 outside the cold branch (hm 4/7/09 fix, ":1462")
    lami_state = jnp.where(cold_act & (qi >= QSMALL), lami, 0.0)
    cdist1 = _sd(nc, _gam(pgam + 1.0))

    # mass/number-weighted fall speeds with realistic caps (shared helper)
    def _vel_rs(lam_, a_, b_, cm, cn, cap):
        um = a_ * cm / lam_ ** b_
        un = a_ * cn / lam_ ** b_
        return jnp.minimum(um, cap * dum54), jnp.minimum(un, cap * dum54)

    # ================= WARM branch (T >= 273.15, ":1509-2040") ==========
    # autoconversion KK2000 (":1642-1664"; identical in cold ":2392-2414")
    has_qc6 = qc >= 1e-6
    prc_all = jnp.where(has_qc6,
                        1350.0 * jnp.maximum(qc, 1e-12) ** 2.47
                        * jnp.maximum(nc / 1e6 * rho, 1e-12) ** (-1.79), 0.0)
    nprc1_all = prc_all / C.CONS29
    nprc_all = jnp.minimum(_sd(prc_all, _sd(qc, nc)), nc / dt)
    nprc1_all = jnp.minimum(nprc1_all, nprc_all)

    # accretion of cloud by rain KK2000 (":1781-1796"; cold ":2706-2721")
    has_rc = (qr >= 1e-8) & (qc >= 1e-8)
    pra_all = jnp.where(has_rc,
                        67.0 * jnp.maximum(qc * qr, 1e-30) ** 1.15, 0.0)
    npra_all = _sd(pra_all, _sd(qc, nc))

    # rain self-collection + breakup (":1798-1815"; cold ":2723-2737")
    has_r8 = qr >= 1e-8
    inv_lamr = 1.0 / lamr
    brk = jnp.where(inv_lamr < 300e-6, 1.0,
                    2.0 - jnp.exp(jnp.minimum(2300.0 * (inv_lamr - 300e-6),
                                              50.0)))
    nragg_all = jnp.where(has_r8, -5.78 * brk * nr * qr * rho, 0.0)

    # rain evaporation (":1817-1838"; cold ":2953-2971")
    epsr = jnp.where(qr >= QSMALL,
                     2.0 * PI * n0rr * rho * dv
                     * (F1R / (lamr * lamr)
                        + F2R * jnp.sqrt(arn * rho / mu)
                        * sc ** (1.0 / 3.0) * C.CONS9 / lamr ** C.CONS34),
                     0.0)
    pre_all = jnp.where(qv < qvs, jnp.minimum(epsr * (qv - qvs) / ab, 0.0),
                        0.0)

    # --- warm-only: melting of snow / graupel (":1694-1775")
    ums_m, uns_m = _vel_rs(lams, asn, BS, C.CONS3, C.CONS5, 1.2)
    umr_m, unr_m = _vel_rs(lamr, arn, BR, C.CONS4, C.CONS6, 9.1)
    umg_m, ung_m = _vel_rs(lamg, agn, C.BG, C.CONS7, C.CONS8, 20.0)

    has_rs = (qr >= 1e-8) & (qs >= 1e-8)
    pracs_m = jnp.where(has_rs, C.CONS41 * (
        jnp.sqrt((1.2 * umr_m - 0.95 * ums_m) ** 2 + 0.08 * ums_m * umr_m)
        * rho * n0rr * n0s / lamr ** 3
        * (5.0 / (lamr ** 3 * lams) + 2.0 / (lamr ** 2 * lams ** 2)
           + 0.5 / (lamr * lams ** 3))), 0.0)

    has_rg = (qr >= 1e-8) & (qg >= 1e-8)
    pracg_m = jnp.where(has_rg, C.CONS41 * (
        jnp.sqrt((1.2 * umr_m - 0.95 * umg_m) ** 2 + 0.08 * umg_m * umr_m)
        * rho * n0rr * n0g / lamr ** 3
        * (5.0 / (lamr ** 3 * lamg) + 2.0 / (lamr ** 2 * lamg ** 2)
           + 0.5 / (lamr * lamg ** 3))), 0.0)
    # shed 1mm drops (":1752-1768")
    npracg_w = jnp.where(has_rg, C.CONS32 * rho * jnp.sqrt(
        1.7 * (unr_m - ung_m) ** 2 + 0.3 * unr_m * ung_m)
        * n0rr * n0g * (1.0 / (lamr ** 3 * lamg)
                        + 1.0 / (lamr ** 2 * lamg ** 2)
                        + 1.0 / (lamr * lamg ** 3)) - pracg_m / 5.2e-7, 0.0)

    # snow melting (Rutledge & Hobbs; accelerated by rain collisions)
    has_s8 = qs >= 1e-8
    vent_s = (F1S / (lams * lams) + F2S * jnp.sqrt(asn * rho / mu)
              * sc ** (1.0 / 3.0) * C.CONS10 / lams ** C.CONS35)
    psmlt = jnp.where(has_s8,
                      2.0 * PI * n0s * kap * (273.15 - t) / xlf * vent_s
                      - CPW / xlf * (t - 273.15) * pracs_m, 0.0)
    epss_m = 2.0 * PI * n0s * rho * dv * vent_s
    evpms = jnp.where(has_s8 & (qvqvs < 1.0),
                      jnp.maximum((qv - qvs) * epss_m / ab, psmlt), 0.0)
    psmlt = psmlt - evpms

    has_g8 = qg >= 1e-8
    vent_g = (F1S / (lamg * lamg) + F2S * jnp.sqrt(agn * rho / mu)
              * sc ** (1.0 / 3.0) * C.CONS11 / lamg ** C.CONS36)
    pgmlt = jnp.where(has_g8,
                      2.0 * PI * n0g * kap * (273.15 - t) / xlf * vent_g
                      - CPW / xlf * (t - 273.15) * pracg_m, 0.0)
    epsg_m = 2.0 * PI * n0g * rho * dv * vent_g
    evpmg = jnp.where(has_g8 & (qvqvs < 1.0),
                      jnp.maximum((qv - qvs) * epsg_m / ab, pgmlt), 0.0)
    pgmlt = pgmlt - evpmg
    # PRACS/PRACG reset to 0 after enhancing melting (":1871-1876")

    # warm conservation (":1884-1951")
    def _ratio(dum, qx):
        need = (dum > qx) & (qx >= QSMALL)
        return jnp.where(need, _sd(qx, dum), 1.0), need

    rt, _ = _ratio((prc_all + pra_all) * dt, qc)
    prc_w, pra_w = prc_all * rt, pra_all * rt
    rt, _ = _ratio((-psmlt - evpms) * dt, qs)
    psmlt_w, evpms_w = psmlt * rt, evpms * rt
    rt, _ = _ratio((-pgmlt - evpmg) * dt, qg)
    pgmlt_w, evpmg_w = pgmlt * rt, evpmg * rt
    dum_r = (-pre_all - pra_w - prc_w + psmlt_w + pgmlt_w) * dt
    need = (dum_r > qr) & (qr >= QSMALL)
    rt = jnp.where(need, _sd(qr / dt + pra_w + prc_w - psmlt_w - pgmlt_w,
                             -pre_all), 1.0)
    pre_w = pre_all * rt

    # warm number melt/evap adjustments (":1977-2008")
    nsubr_w = jnp.where(pre_w < 0.0,
                        jnp.maximum(-1.0, _sd(pre_w * dt, qr)) * nr / dt, 0.0)
    nsmlts = jnp.where(evpms_w + psmlt_w < 0.0,
                       jnp.maximum(-1.0, _sd((evpms_w + psmlt_w) * dt, qs))
                       * ns / dt, 0.0)
    nsmltr = jnp.where(psmlt_w < 0.0,
                       jnp.maximum(-1.0, _sd(psmlt_w * dt, qs)) * ns / dt,
                       0.0)
    ngmltg = jnp.where(evpmg_w + pgmlt_w < 0.0,
                       jnp.maximum(-1.0, _sd((evpmg_w + pgmlt_w) * dt, qg))
                       * ng / dt, 0.0)
    ngmltr = jnp.where(pgmlt_w < 0.0,
                       jnp.maximum(-1.0, _sd(pgmlt_w * dt, qg)) * ng / dt,
                       0.0)

    warm_ten = dict(
        qv=-pre_w - evpms_w - evpmg_w,
        t=(pre_w * xxlv + (evpms_w + evpmg_w) * xxls
           + (psmlt_w + pgmlt_w) * xlf) / cpm,
        qc=-pra_w - prc_w,
        qr=pre_w + pra_w + prc_w - psmlt_w - pgmlt_w,
        qi=zero,
        qs=psmlt_w + evpms_w,
        qg=pgmlt_w + evpmg_w,
        nc=-npra_all - nprc_all,
        ni=zero,
        ns=nsmlts,
        nr=nprc1_all + nragg_all - npracg_w + nsubr_w - nsmltr - ngmltr,
        ng=ngmltg,
    )

    # ================= COLD branch (T < 273.15, ":2121-3305") ===========
    # contact + immersion freezing of droplets (":2327-2386")
    frz_c = (qc >= QSMALL) & (t < 269.15)
    nacnt = jnp.exp(-2.80 + 0.262 * (273.15 - t)) * 1000.0
    mfp = 7.37 * t / (288.0 * 10.0 * p) / 100.0
    dap = C.CONS37 * t * (1.0 + mfp / RIN) / mu
    log_cdist1 = jnp.log(jnp.maximum(cdist1, 1e-35))
    mnucc_contact = (C.CONS38 * dap * nacnt
                     * jnp.exp(log_cdist1 + jax.lax.lgamma(pgam + 5.0)
                               - 4.0 * jnp.log(lamc)))
    nnucc_contact = (2.0 * PI * dap * nacnt * cdist1
                     * _gam(pgam + 2.0) / lamc)
    eimm = jnp.exp(jnp.minimum(AIMM * (273.15 - t), 50.0)) - 1.0
    mnucc_imm = (C.CONS39
                 * jnp.exp(log_cdist1 + jax.lax.lgamma(7.0 + pgam)
                           - 6.0 * jnp.log(lamc)) * eimm)
    nnucc_imm = (C.CONS40
                 * jnp.exp(log_cdist1 + jax.lax.lgamma(pgam + 4.0)
                           - 3.0 * jnp.log(lamc)) * eimm)
    mnuccc = jnp.where(frz_c, mnucc_contact + mnucc_imm, 0.0)
    nnuccc = jnp.where(frz_c,
                       jnp.minimum(nnucc_contact + nnucc_imm, nc / dt), 0.0)

    # snow aggregation (":2417-2425")
    nsagg = jnp.where(qs >= 1e-8,
                      C.CONS15 * asn * rho ** ((2.0 + BS) / 3.0)
                      * jnp.maximum(qs, 1e-12) ** ((2.0 + BS) / 3.0)
                      * (jnp.maximum(ns, 1e-12) * rho) ** ((4.0 - BS) / 3.0)
                      / rho, 0.0)

    # droplet accretion by snow / graupel / ice (":2427-2480")
    has_sc = (qs >= 1e-8) & (qc >= QSMALL)
    psacws = jnp.where(has_sc,
                       C.CONS13 * asn * qc * rho * n0s / lams ** (BS + 3.0),
                       0.0)
    npsacws = jnp.where(has_sc,
                        C.CONS13 * asn * nc * rho * n0s / lams ** (BS + 3.0),
                        0.0)
    has_gc = (qg >= 1e-8) & (qc >= QSMALL)
    psacwg = jnp.where(has_gc,
                       C.CONS14 * agn * qc * rho * n0g
                       / lamg ** (C.BG + 3.0), 0.0)
    npsacwg = jnp.where(has_gc,
                        C.CONS14 * agn * nc * rho * n0g
                        / lamg ** (C.BG + 3.0), 0.0)
    has_ic = (qi >= 1e-8) & (qc >= QSMALL) & (1.0 / lami >= 100e-6)
    psacwi = jnp.where(has_ic,
                       C.CONS16 * ain * qc * rho * n0i / lami ** (BI + 3.0),
                       0.0)
    npsacwi = jnp.where(has_ic,
                        C.CONS16 * ain * nc * rho * n0i / lami ** (BI + 3.0),
                        0.0)

    # rain-snow collection (":2482-2540")
    pracs = jnp.where(has_rs, jnp.minimum(C.CONS41 * (
        jnp.sqrt((1.2 * umr_m - 0.95 * ums_m) ** 2 + 0.08 * ums_m * umr_m)
        * rho * n0rr * n0s / lamr ** 3
        * (5.0 / (lamr ** 3 * lams) + 2.0 / (lamr ** 2 * lams ** 2)
           + 0.5 / (lamr * lams ** 3))), qr / dt), 0.0)
    npracs = jnp.where(has_rs, C.CONS32 * rho * jnp.sqrt(
        1.7 * (unr_m - uns_m) ** 2 + 0.3 * unr_m * uns_m)
        * n0rr * n0s * (1.0 / (lamr ** 3 * lams)
                        + 1.0 / (lamr ** 2 * lams ** 2)
                        + 1.0 / (lamr * lams ** 3)), 0.0)
    # snow collected by rain, for graupel conversion (":2524-2537")
    psacr = jnp.where(has_rs & (qs >= 0.1e-3) & (qr >= 0.1e-3),
                      C.CONS31 * (jnp.sqrt((1.2 * umr_m - 0.95 * ums_m) ** 2
                                           + 0.08 * ums_m * umr_m)
                                  * rho * n0rr * n0s / lams ** 3
                                  * (5.0 / (lams ** 3 * lamr)
                                     + 2.0 / (lams ** 2 * lamr ** 2)
                                     + 0.5 / (lams * lamr ** 3))), 0.0)

    # rain-graupel collection (":2542-2580")
    pracg = jnp.where(has_rg, jnp.minimum(C.CONS41 * (
        jnp.sqrt((1.2 * umr_m - 0.95 * umg_m) ** 2 + 0.08 * umg_m * umr_m)
        * rho * n0rr * n0g / lamr ** 3
        * (5.0 / (lamr ** 3 * lamg) + 2.0 / (lamr ** 2 * lamg ** 2)
           + 0.5 / (lamr * lamg ** 3))), qr / dt), 0.0)
    npracg_c = jnp.where(has_rg, C.CONS32 * rho * jnp.sqrt(
        1.7 * (unr_m - ung_m) ** 2 + 0.3 * unr_m * ung_m)
        * n0rr * n0g * (1.0 / (lamr ** 3 * lamg)
                        + 1.0 / (lamr ** 2 * lamg ** 2)
                        + 1.0 / (lamr * lamg ** 3)), 0.0)

    # Hallett-Mossop rime splintering: snow (":2582-2640")
    fmult = jnp.clip(jnp.where(t > 268.16, (270.16 - t) / 2.0,
                               (t - 265.16) / 3.0), 0.0, 1.0)
    fmult = jnp.where((t < 270.16) & (t > 265.16), fmult, 0.0)
    hm_gate_s = ((qs >= 0.1e-3) & ((qc >= 0.5e-3) | (qr >= 0.1e-3))
                 & (t < 270.16) & (t > 265.16))
    can_s = hm_gate_s & (psacws > 0.0)
    qmults = jnp.where(can_s,
                       jnp.minimum(35e4 * psacws * fmult * 1000.0 * MMULT,
                                   psacws), 0.0)
    nmults = jnp.where(can_s, 35e4 * psacws * fmult * 1000.0, 0.0)
    psacws = psacws - qmults
    can_sr = hm_gate_s & (pracs > 0.0)
    qmultr = jnp.where(can_sr,
                       jnp.minimum(35e4 * pracs * fmult * 1000.0 * MMULT,
                                   pracs), 0.0)
    nmultr = jnp.where(can_sr, 35e4 * pracs * fmult * 1000.0, 0.0)
    pracs = pracs - qmultr

    # rime splintering: graupel (":2642-2700")
    hm_gate_g = ((qg >= 0.1e-3) & ((qc >= 0.5e-3) | (qr >= 0.1e-3))
                 & (t < 270.16) & (t > 265.16))
    can_g = hm_gate_g & (psacwg > 0.0)
    qmultg = jnp.where(can_g,
                       jnp.minimum(35e4 * psacwg * fmult * 1000.0 * MMULT,
                                   psacwg), 0.0)
    nmultg = jnp.where(can_g, 35e4 * psacwg * fmult * 1000.0, 0.0)
    psacwg = psacwg - qmultg
    can_gr = hm_gate_g & (pracg > 0.0)
    qmultrg = jnp.where(can_gr,
                        jnp.minimum(35e4 * pracg * fmult * 1000.0 * MMULT,
                                    pracg), 0.0)
    nmultrg = jnp.where(can_gr, 35e4 * pracg * fmult * 1000.0, 0.0)
    pracg = pracg - qmultrg

    # graupel conversion from rimed snow (":2703-2750")
    conv_w = (psacws > 0.0) & (qs >= 0.1e-3) & (qc >= 0.5e-3)
    pgsacw = jnp.where(conv_w,
                       jnp.minimum(psacws,
                                   C.CONS17 * dt * n0s * qc * qc * asn * asn
                                   / (rho * lams ** (2.0 * BS + 2.0))), 0.0)
    nscng = jnp.where(conv_w,
                      jnp.minimum(jnp.maximum(RHOSN / (C.RHOG - RHOSN)
                                              * pgsacw, 0.0) / MG0 * rho,
                                  ns / dt), 0.0)
    psacws = psacws - pgsacw

    conv_r = (pracs > 0.0) & (qs >= 0.1e-3) & (qr >= 0.1e-3)
    ls4 = (4.0 / lams) ** 3
    lr4 = (4.0 / lamr) ** 3
    frac_s = jnp.clip(_sd(C.CONS18 * ls4 * ls4,
                          C.CONS18 * ls4 * ls4 + C.CONS19 * lr4 * lr4),
                      0.0, 1.0)
    pgracs = jnp.where(conv_r, (1.0 - frac_s) * pracs, 0.0)
    ngracs = jnp.where(conv_r,
                       jnp.minimum(jnp.minimum((1.0 - frac_s) * npracs,
                                               nr / dt), ns / dt), 0.0)
    pracs = jnp.where(conv_r, pracs - pgracs, pracs)
    npracs = jnp.where(conv_r, npracs - ngracs, npracs)
    psacr = jnp.where(conv_r, psacr * (1.0 - frac_s), psacr)

    # immersion freezing of rain (":2752-2774")
    frz_r = (t < 269.15) & (qr >= QSMALL)
    mnuccr = jnp.where(frz_r, C.CONS20 * nr * eimm / lamr ** 6, 0.0)
    nnuccr = jnp.where(frz_r,
                       jnp.minimum(PI * nr * BIMM * eimm / lamr ** 3,
                                   nr / dt), 0.0)

    # ice autoconversion to snow (":2739-2757" Harrington)
    auto_i = (qi >= 1e-8) & (qvqvsi >= 1.0)
    nprci = jnp.where(auto_i,
                      C.CONS21 * (qv - qvi) * rho * n0i
                      * jnp.exp(-lami * DCS) * dv / abi, 0.0)
    prci = C.CONS22 * nprci
    nprci = jnp.minimum(nprci, ni / dt)

    # ice accretion by snow (":2759-2771")
    acc_is = (qs >= 1e-8) & (qi >= QSMALL)
    prai = jnp.where(acc_is,
                     C.CONS23 * asn * qi * rho * n0s / lams ** (BS + 3.0),
                     0.0)
    nprai = jnp.where(acc_is,
                      jnp.minimum(C.CONS23 * asn * ni * rho * n0s
                                  / lams ** (BS + 3.0), ni / dt), 0.0)

    # rain-ice collisions (":2773-2805")
    ri = (qr >= 1e-8) & (qi >= 1e-8) & (t <= 273.15)
    ri_g = ri & (qr >= 0.1e-3)
    ri_s = ri & ~ri_g
    niacr_raw = C.CONS24 * ni * n0rr * arn / lamr ** (BR + 3.0) * rho
    piacr_raw = (C.CONS25 * ni * n0rr * arn / lamr ** (BR + 3.0)
                 / lamr ** 3 * rho)
    praci_raw = C.CONS24 * qi * n0rr * arn / lamr ** (BR + 3.0) * rho
    ncap = jnp.minimum(jnp.minimum(niacr_raw, nr / dt), ni / dt)
    niacr = jnp.where(ri_g, ncap, 0.0)
    piacr = jnp.where(ri_g, piacr_raw, 0.0)
    praci = jnp.where(ri_g, praci_raw, 0.0)
    niacrs = jnp.where(ri_s, ncap, 0.0)
    piacrs = jnp.where(ri_s, piacr_raw, 0.0)
    pracis = jnp.where(ri_s, praci_raw, 0.0)

    # primary ice nucleation, INUC=0 Cooper curve (":2807-2841")
    nuc = ((qvqvs >= 0.999) & (t <= 265.15)) | (qvqvsi >= 1.08)
    kc2 = 0.005 * jnp.exp(jnp.minimum(0.304 * (273.15 - t), 50.0)) * 1000.0
    kc2 = jnp.maximum(jnp.minimum(kc2, 500e3) / rho, 0.0)
    can_nuc = nuc & (kc2 > ni + ns + ng)
    nnuccd = jnp.where(can_nuc, (kc2 - ni - ns - ng) / dt, 0.0)
    mnuccd = nnuccd * MI0

    # deposition/sublimation (":2850-2962")
    epsi = jnp.where(qi >= QSMALL,
                     2.0 * PI * n0i * rho * dv / (lami * lami), 0.0)
    epss = jnp.where(qs >= QSMALL, 2.0 * PI * n0s * rho * dv * vent_s, 0.0)
    epsg = jnp.where(qg >= QSMALL, 2.0 * PI * n0g * rho * dv * vent_g, 0.0)
    tail = jnp.where(qi >= QSMALL,
                     1.0 - jnp.exp(-lami * DCS) * (1.0 + lami * DCS), 0.0)
    dep_fac = (qv - qvi) / abi
    prd = jnp.where(qi >= QSMALL, epsi * dep_fac * tail, 0.0)
    has_snow = qs >= QSMALL
    prds = jnp.where(has_snow, epss * dep_fac + epsi * dep_fac * (1.0 - tail),
                     0.0)
    prd = jnp.where(has_snow | (qi < QSMALL), prd,
                    prd + epsi * dep_fac * (1.0 - tail))
    prdg = epsg * dep_fac
    pre_c = pre_all  # same evaporation formula as the warm branch

    # Reisner-2 anti-overshoot (":2975-3005")
    dum_vi = (qv - qvi) / dt
    sum_dep = prd + prds + mnuccd + prdg
    fudge = 0.9999
    over = (((dum_vi > 0.0) & (sum_dep > dum_vi * fudge))
            | ((dum_vi < 0.0) & (sum_dep < dum_vi * fudge)))
    scale_dep = jnp.where(over, fudge * _sd(dum_vi, sum_dep), 1.0)
    prd, prds = prd * scale_dep, prds * scale_dep
    prdg, mnuccd = prdg * scale_dep, mnuccd * scale_dep
    eprd = jnp.minimum(prd, 0.0)
    prd = jnp.maximum(prd, 0.0)
    eprds = jnp.minimum(prds, 0.0)
    prds = jnp.maximum(prds, 0.0)
    eprdg = jnp.minimum(prdg, 0.0)
    prdg = jnp.maximum(prdg, 0.0)

    # cold conservation (":3080-3200")
    rt, _ = _ratio((prc_all + pra_all + mnuccc + psacws + psacwi + qmults
                    + psacwg + pgsacw + qmultg) * dt, qc)
    prc_c, pra_c = prc_all * rt, pra_all * rt
    mnuccc, psacws, psacwi = mnuccc * rt, psacws * rt, psacwi * rt
    qmults, qmultg = qmults * rt, qmultg * rt
    psacwg, pgsacw = psacwg * rt, pgsacw * rt

    dum_i = (-prd - mnuccc + prci + prai - qmults - qmultg - qmultr
             - qmultrg - mnuccd + praci + pracis - eprd - psacwi) * dt
    need = (dum_i > qi) & (qi >= QSMALL)
    rt = jnp.where(need, _sd(qi / dt + prd + mnuccc + qmults + qmultg
                             + qmultr + qmultrg + mnuccd + psacwi,
                             prci + prai + praci + pracis - eprd), 1.0)
    prci, prai = prci * rt, prai * rt
    praci, pracis, eprd = praci * rt, pracis * rt, eprd * rt

    dum_r2 = ((pracs - pre_c) + (qmultr + qmultrg - prc_c)
              + (mnuccr - pra_c) + piacr + piacrs + pgracs + pracg) * dt
    need = (dum_r2 > qr) & (qr >= QSMALL)
    rt = jnp.where(need, _sd(qr / dt + prc_c + pra_c,
                             -pre_c + qmultr + qmultrg + pracs + mnuccr
                             + piacr + piacrs + pgracs + pracg), 1.0)
    pre_c, pracs = pre_c * rt, pracs * rt
    qmultr, qmultrg = qmultr * rt, qmultrg * rt
    mnuccr, piacr, piacrs = mnuccr * rt, piacr * rt, piacrs * rt
    pgracs, pracg = pgracs * rt, pracg * rt

    dum_s = (-prds - psacws - prai - prci - pracs - eprds + psacr - piacrs
             - pracis) * dt
    need = (dum_s > qs) & (qs >= QSMALL)
    rt = jnp.where(need, _sd(qs / dt + prds + psacws + prai + prci + pracs
                             + piacrs + pracis, -eprds + psacr), 1.0)
    eprds, psacr = eprds * rt, psacr * rt

    dum_g = (-psacwg - pracg - pgsacw - pgracs - prdg - mnuccr - eprdg
             - piacr - praci - psacr) * dt
    need = (dum_g > qg) & (qg >= QSMALL)
    rt = jnp.where(need, _sd(qg / dt + psacwg + pracg + pgsacw + pgracs
                             + prdg + mnuccr + psacr + piacr + praci,
                             -eprdg), 1.0)
    eprdg = eprdg * rt

    cold_qv = (-pre_c - prd - prds - mnuccd - eprd - eprds - prdg - eprdg)
    cold_t = (pre_c * xxlv
              + (prd + prds + mnuccd + eprd + eprds + prdg + eprdg) * xxls
              + (psacws + psacwi + mnuccc + mnuccr + qmults + qmultg
                 + qmultr + qmultrg + pracs + psacwg + pracg + pgsacw
                 + pgracs + piacr + piacrs) * xlf) / cpm
    cold_qc = (-pra_c - prc_c - mnuccc - psacws - psacwi - qmults - qmultg
               - psacwg - pgsacw)
    cold_qi = (prd + eprd + psacwi + mnuccc - prci - prai + qmults + qmultg
               + qmultr + qmultrg + mnuccd - praci - pracis)
    cold_qr = (pre_c + pra_c + prc_c - pracs - mnuccr - qmultr - qmultrg
               - piacr - piacrs - pracg - pgracs)
    cold_qs = (prai + psacws + prds + pracs + prci + eprds - psacr + piacrs
               + pracis)
    cold_ns = nsagg + nprci - nscng - ngracs + niacrs
    cold_qg = (pracg + psacwg + pgsacw + pgracs + prdg + eprdg + mnuccr
               + piacr + praci + psacr)
    cold_ng = nscng + ngracs + nnuccr + niacr
    cold_nc = (-nnuccc - npsacws - npra_all - nprc_all - npsacwi - npsacwg)
    cold_ni = (nnuccc - nprci - nprai + nmults + nmultg + nmultr + nmultrg
               + nnuccd - niacr - niacrs)
    cold_nr = (nprc1_all - npracs - nnuccr + nragg_all - niacr - niacrs
               - npracg_c - ngracs)

    # number sublimation/evaporation adjustments (":3290-3330")
    nsubi = jnp.where(eprd < 0.0,
                      jnp.maximum(-1.0, _sd(eprd * dt, qi)) * ni / dt, 0.0)
    nsubs = jnp.where(eprds < 0.0,
                      jnp.maximum(-1.0, _sd(eprds * dt, qs)) * ns / dt, 0.0)
    nsubr_c = jnp.where(pre_c < 0.0,
                        jnp.maximum(-1.0, _sd(pre_c * dt, qr)) * nr / dt,
                        0.0)
    nsubg = jnp.where(eprdg < 0.0,
                      jnp.maximum(-1.0, _sd(eprdg * dt, qg)) * ng / dt, 0.0)
    cold_ni = cold_ni + nsubi
    cold_ns = cold_ns + nsubs
    cold_nr = cold_nr + nsubr_c
    cold_ng = cold_ng + nsubg

    cold_ten = dict(qv=cold_qv, t=cold_t, qc=cold_qc, qi=cold_qi,
                    qr=cold_qr, qs=cold_qs, qg=cold_qg, nc=cold_nc,
                    ni=cold_ni, ns=cold_ns, nr=cold_nr, ng=cold_ng)

    # ---- blend branches, gate by skip masks -----------------------------
    ten = {}
    for key in warm_ten:
        wv = jnp.where(w_nowater, 0.0, warm_ten[key])
        ten[key] = jnp.where(active,
                             jnp.where(warm, wv, cold_ten[key]), 0.0)

    # ---- liquid saturation adjustment (both branches, ":2013-2031") ----
    dumt = t + dt * ten["t"]
    dumqv = qv + dt * ten["qv"]
    es_d = jnp.minimum(0.99 * p, polysvp(dumt, False))
    dumqss = EP_2 * es_d / (p - es_d)
    dumqc = jnp.maximum(qc + dt * ten["qc"], 0.0)
    pcc = ((dumqv - dumqss)
           / (1.0 + xxlv * xxlv * dumqss / (cpm * RV * dumt * dumt)) / dt)
    pcc = jnp.maximum(pcc, -dumqc / dt)
    pcc = jnp.where(active, pcc, 0.0)
    ten["qv"] = ten["qv"] - pcc
    ten["t"] = ten["t"] + pcc * xxlv / cpm
    ten["qc"] = ten["qc"] + pcc

    # ================= sedimentation (":3341-3584") ======================
    dums = {
        "qr": qr + ten["qr"] * dt, "qi": qi + ten["qi"] * dt,
        "qs": qs + ten["qs"] * dt, "qc": qc + ten["qc"] * dt,
        "qg": qg + ten["qg"] * dt,
        "ni": jnp.maximum(ni + ten["ni"] * dt, 0.0),
        "ns": jnp.maximum(ns + ten["ns"] * dt, 0.0),
        "nr": jnp.maximum(nr + ten["nr"] * dt, 0.0),
        "ng": jnp.maximum(ng + ten["ng"] * dt, 0.0),
        "nc": jnp.maximum(nc, 0.0),  # iinum=1 (":3380-3383")
    }

    def _dlam(q_, n_, coef, d, lmin, lmax):
        qs_ = jnp.maximum(q_, QSMALL)
        return jnp.clip((coef * jnp.maximum(n_, 0.0) / qs_) ** (1.0 / d),
                        lmin, lmax)

    dlami = _dlam(dums["qi"], dums["ni"], C.CONS12, DI, LAMMINI, LAMMAXI)
    dlamr = _dlam(dums["qr"], dums["nr"], PI * RHOW, 3.0, LAMMINR, LAMMAXR)
    dlams = _dlam(dums["qs"], dums["ns"], C.CONS1, DS, LAMMINS, LAMMAXS)
    dlamg = _dlam(dums["qg"], dums["ng"], C.CONS2, DG, LAMMING, LAMMAXG)
    # droplets: pgam from the pre-tendency nc (":3395-3407")
    dqc = jnp.maximum(dums["qc"], QSMALL)
    pg_d = jnp.clip(1.0 / (0.0005714 * (jnp.maximum(nc, 0.0) / 1e6
                                        * (p / (287.15 * t))) + 0.2714) ** 2
                    - 1.0, 2.0, 10.0)
    dlamc = jnp.clip((C.CONS26 * jnp.maximum(dums["nc"], 1e-6)
                      * _gam(pg_d + 4.0)
                      / (dqc * _gam(pg_d + 1.0))) ** (1.0 / 3.0),
                     (pg_d + 1.0) / 60e-6, (pg_d + 1.0) / 1e-6)

    def _vpair(cond, um, un):
        return (jnp.where(cond, um, 0.0), jnp.where(cond, un, 0.0))

    has = {k: dums[k] >= QSMALL for k in ("qc", "qi", "qr", "qs", "qg")}
    umc, unc = _vpair(has["qc"],
                      acn * _gam(4.0 + BC + pg_d)
                      / (dlamc ** BC * _gam(pg_d + 4.0)),
                      acn * _gam(1.0 + BC + pg_d)
                      / (dlamc ** BC * _gam(pg_d + 1.0)))
    umi, uni = _vpair(has["qi"], ain * C.CONS28 / dlami ** BI,
                      ain * C.CONS27 / dlami ** BI)
    umr, unr = _vpair(has["qr"], arn * C.CONS4 / dlamr ** BR,
                      arn * C.CONS6 / dlamr ** BR)
    ums, uns = _vpair(has["qs"], asn * C.CONS3 / dlams ** BS,
                      asn * C.CONS5 / dlams ** BS)
    umg, ung = _vpair(has["qg"], agn * C.CONS7 / dlamg ** C.BG,
                      agn * C.CONS8 / dlamg ** C.BG)
    # realistic caps (":3500-3512")
    cap35 = 1.2 * (RHOSU / rho) ** 0.35
    ums, uns = jnp.minimum(ums, 1.2 * dum54), jnp.minimum(uns, 1.2 * dum54)
    umi, uni = jnp.minimum(umi, cap35), jnp.minimum(uni, cap35)
    umr, unr = jnp.minimum(umr, 9.1 * dum54), jnp.minimum(unr, 9.1 * dum54)
    umg, ung = jnp.minimum(umg, 20.0 * dum54), jnp.minimum(ung, 20.0 * dum54)

    # fallspeed below the lowest precip level: downward propagation
    # (":3516-3547") — F(k) = F(k+1) when F(k) < 1e-10, cascading top-down
    fstack = jnp.stack([umr, umi, uni, ums, uns, unr, umc, unc, umg, ung])
    frev = jnp.flip(fstack, axis=1)           # index 0 = model top
    frev_t = jnp.moveaxis(frev, 1, 0)         # (nz, 10, ny, nx)

    def _prop(carry, fk):
        out = jnp.where(fk < 1e-10, carry, fk)
        return out, out

    _, fprop = jax.lax.scan(_prop, frev_t[0], frev_t)
    fstack = jnp.flip(jnp.moveaxis(fprop, 0, 1), axis=1)
    (fr_, fi_, fni_, fs_, fns_, fnr_, fc_, fnc_, fg_, fng_) = fstack

    # per-column substep count NSTEP = max_k INT(v dt/dz + 1) (":3550-3553")
    rgvm = jnp.max(fstack, axis=0)
    nstep = jnp.max((rgvm * dt / dz + 1.0).astype(jnp.int32), axis=0)
    nstep = jnp.maximum(nstep, 1)              # (ny, nx)
    nstep_f = nstep.astype(f32)
    nmax = jnp.max(nstep)

    # multiply dummies by rho (":3556-3566")
    order = ("qr", "qi", "ni", "qs", "ns", "nr", "qc", "nc", "qg", "ng")
    fall = dict(qr=fr_, qi=fi_, ni=fni_, qs=fs_, ns=fns_, nr=fnr_,
                qc=fc_, nc=fnc_, qg=fg_, ng=fng_)
    dum_rho = {k: dums[k] * rho for k in order}

    sten0 = {k: zero for k in order}
    acc0 = jnp.zeros(qv.shape[1:], f32)

    def _substep(carry):
        n, dum_rho, sten, prec, snowr, snowp, grpl = carry
        act = (n < nstep).astype(f32)          # (ny, nx)
        new_dum, new_sten = {}, {}
        bot = {}
        for k in order:
            falout = fall[k] * dum_rho[k]
            fal_above = jnp.concatenate(
                [falout[1:], jnp.zeros_like(falout[:1])], axis=0)
            faltnd = (fal_above - falout) / dz
            new_sten[k] = sten[k] + act * faltnd / nstep_f / rho
            new_dum[k] = dum_rho[k] + act * faltnd * dt / nstep_f
            bot[k] = falout[0]
        prec = prec + act * (bot["qr"] + bot["qc"] + bot["qs"] + bot["qi"]
                             + bot["qg"]) * dt / nstep_f
        snowr = snowr + act * (bot["qs"] + bot["qi"] + bot["qg"]) \
            * dt / nstep_f
        snowp = snowp + act * (bot["qi"] + bot["qs"]) * dt / nstep_f
        grpl = grpl + act * bot["qg"] * dt / nstep_f
        return n + 1, new_dum, new_sten, prec, snowr, snowp, grpl

    init = (jnp.int32(0), dum_rho, sten0, acc0, acc0, acc0, acc0)
    _, _, sten, precrt, snowrt, snowprt, grplprt = jax.lax.while_loop(
        lambda c: c[0] < nmax, _substep, init)

    for k in ("qr", "qi", "qs", "qc", "qg"):
        ten[k] = ten[k] + sten[k]
    for k in ("ni", "ns", "nr", "ng"):
        ten[k] = ten[k] + sten[k]

    # ================= final section (":3589-4040") ======================
    # migrate over-sized cloud ice into snow (":3596-3607")
    big_ice = ((qi >= QSMALL) & (t < 273.15) & (lami_state >= 1e-10)
               & (1.0 / jnp.maximum(lami_state, 1e-10) >= 2.0 * DCS))
    ten["qs"] = ten["qs"] + jnp.where(big_ice, qi / dt + ten["qi"], 0.0)
    ten["ns"] = ten["ns"] + jnp.where(big_ice, ni / dt + ten["ni"], 0.0)
    ten["qi"] = jnp.where(big_ice, -qi / dt, ten["qi"])
    ten["ni"] = jnp.where(big_ice, -ni / dt, ten["ni"])

    # apply tendencies (":3612-3630")
    qc = qc + ten["qc"] * dt
    qi = qi + ten["qi"] * dt
    qs = qs + ten["qs"] * dt
    qr = qr + ten["qr"] * dt
    ni = ni + ten["ni"] * dt
    ns = ns + ten["ns"] * dt
    nr = nr + ten["nr"] * dt
    qg = qg + ten["qg"] * dt
    ng = ng + ten["ng"] * dt
    t = t + ten["t"] * dt
    qv = qv + ten["qv"] * dt

    # refresh saturation, absorb trace water again (":3700-3750")
    qvs, qvi, qvqvs, qvqvsi = _sat(t, qv)
    liq_dry = qvqvs < 0.9
    ice_dry = qvqvsi < 0.9
    qr = _absorb(qr, xxlv, liq_dry)
    qc = _absorb(qc, xxlv, liq_dry)
    qi = _absorb(qi, xxls, ice_dry)
    qs = _absorb(qs, xxls, ice_dry)
    qg = _absorb(qg, xxls, ice_dry)

    qc, nc = _zero_small(qc, nc)
    qr, nr = _zero_small(qr, nr)
    qi, ni = _zero_small(qi, ni)
    qs, ns = _zero_small(qs, ns)
    qg, ng = _zero_small(qg, ng)

    # instantaneous melting of cloud ice (":3790-3800")
    melt_i = (qi >= QSMALL) & (t >= 273.15)
    qr = qr + jnp.where(melt_i, qi, 0.0)
    t = t - jnp.where(melt_i, qi * xlf / cpm, 0.0)
    nr = nr + jnp.where(melt_i, ni, 0.0)
    qi = jnp.where(melt_i, 0.0, qi)
    ni = jnp.where(melt_i, 0.0, ni)

    # homogeneous freezing (":3805-3835")
    frz_qc = (t <= 233.15) & (qc >= QSMALL)
    qi = qi + jnp.where(frz_qc, qc, 0.0)
    t = t + jnp.where(frz_qc, qc * xlf / cpm, 0.0)
    ni = ni + jnp.where(frz_qc, nc, 0.0)
    qc = jnp.where(frz_qc, 0.0, qc)

    frz_qr = (t <= 233.15) & (qr >= QSMALL)
    qg = qg + jnp.where(frz_qr, qr, 0.0)
    t = t + jnp.where(frz_qr, qr * xlf / cpm, 0.0)
    ng = ng + jnp.where(frz_qr, nr, 0.0)
    qr = jnp.where(frz_qr, 0.0, qr)
    nr = jnp.where(frz_qr, 0.0, nr)

    ni = jnp.maximum(ni, 0.0)
    ns = jnp.maximum(ns, 0.0)
    nr = jnp.maximum(nr, 0.0)
    ng = jnp.maximum(ng, 0.0)

    # final PSD lambda clamping, adjusting N (":3845-3990")
    _, _, ni_f = _psd(qi, ni, C.CONS12, DI, LAMMINI, LAMMAXI)
    _, _, nr_f = _psd(qr, nr, PI * RHOW, 3.0, LAMMINR, LAMMAXR)
    _, _, ns_f = _psd(qs, ns, C.CONS1, DS, LAMMINS, LAMMAXS)
    _, _, ng_f = _psd(qg, ng, C.CONS2, DG, LAMMING, LAMMAXG)
    ni = jnp.where(qi >= QSMALL, ni_f, ni)
    nr = jnp.where(qr >= QSMALL, nr_f, nr)
    ns = jnp.where(qs >= QSMALL, ns_f, ns)
    ng = jnp.where(qg >= QSMALL, ng_f, ng)

    # anvil-cirrus ice number cap (":4010-4016")
    ni = jnp.minimum(ni, 0.3e6 / rho)

    th_out = t / exner

    # accumulate precipitation [mm] (":871-878")
    rain_acc = rain_acc + precrt
    snow_acc = snow_acc + snowprt
    graupel_acc = graupel_acc + grplprt

    return (th_out, qv, qc, qi, qr, qs, qg, ni, ns, nr, ng,
            rain_acc, snow_acc, graupel_acc)
