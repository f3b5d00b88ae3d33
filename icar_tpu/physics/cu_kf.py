"""Kain-Fritsch cumulus parameterization (conv=3).

JAX re-implementation of /root/reference/src/physics/cu_kf.f90
(module_cu_kf, the WRF KFCPS scheme): Fritsch-Chappell trigger on a
60-mb mixed source layer (cu_kf.f90:500-592), entraining/detraining
plume updraft with Ogura-Cho condensate fallout and linear glaciation
between 268.16 K and 248.16 K (":594-918"), a single-detrainment-layer
evaporatively driven downdraft tied to the precipitation-efficiency
relation (":1152-1410"), and a CAPE-removal closure that iteratively
rescales the convective mass fluxes until >90% of the mixed-parcel CAPE
is removed over the convective time scale (":1412-1740"), followed by
compensating-subsidence feedback tendencies for theta, qv and the four
hydrometeor categories (":1742-1976").

The reference's own cu_driver never enables this scheme (its kfinit and
KFCPS calls are commented out, cu_driver.f90:158-170,332-352); it is
wired here the way those commented calls would, with qi/qs feedback
enabled (F_QI=F_QS=.true.), warm_rain=.false., FBFRC=0 and STEPCU=1.

Column state persisted across substeps (as WRF does through its
registry): the running-mean vertical velocity W0AVG (cu_kf.f90:193-207),
the convective-adjustment countdown NCA (":224-230" — tendencies stay
frozen while NCA > dt/2) and the rain rate PRATEC.

Deliberate divergences from the Fortran (documented):
  * TPMIX/TPDD secant iterations run a fixed 11 evaluations with
    convergence freezing instead of early GOTO exits (same tolerance).
  * the three abort paths that stop the whole model run (negative qv at
    the surface during moisture borrowing, the TOPOMG mass-balance
    check ":1568-1576", and the >0.05% moisture-budget error ":1990")
    instead disable convection for that column this trigger period.

Everything is written per column and vmapped; layout (z, y, x) with
level 0 at the surface.
"""

from __future__ import annotations

from math import pi as _PI

import jax
import jax.numpy as jnp

from .. import constants as Cn

# physical constants as passed by the (commented) ICAR call
# (cu_driver.f90:332-352 -> icar_constants.f90:391-420)
CP = Cn.CP
R = Cn.RD
G = Cn.GRAVITY
EP2 = Cn.EP2
XLV0, XLV1 = Cn.XLV0, Cn.XLV1
XLS0, XLS1 = Cn.XLS0, Cn.XLS1
ALIQ = Cn.SVP1 * 1000.0
BLIQ = Cn.SVP2
CLIQK = Cn.SVP2 * Cn.SVPT0
DLIQ = Cn.SVP3
AICE, BICE, CICEK, DICE = 613.2, 22.452, 6133.0, 0.61

# scheme data (cu_kf.f90:12, 421-428)
RAD_KF = 1500.0
P00, T00 = 1e5, 273.16
B61 = 0.608
RLF = 3.339e5
RHBC = 0.90
TTFRZ, TBFRZ = 268.16, 248.16
C5 = 1.0723e-3
RATE = 0.01
FBFRC = 0.0
GDRY = -G / CP
AU0 = _PI * RAD_KF * RAD_KF
STAB = 0.95


def _esl(t):
    return ALIQ * jnp.exp((BLIQ * t - CLIQK) / (t - DLIQ))


def _esi(t):
    return AICE * jnp.exp((BICE * t - CICEK) / (t - DICE))


def _sd(x, y, eps=1e-10):
    return x / jnp.where(jnp.abs(y) < eps, jnp.where(y < 0, -eps, eps), y)


def _thtgs(t, p, ratio2, rl):
    """Saturated theta-e at temperature t for glaciation fraction ratio2
    (TPMIX regimes, cu_kf.f90:2280-2338). Returns (thtgs, qs)."""
    esl, esi = _esl(t), _esi(t)
    reg0 = ratio2 < 1e-6
    reg1 = jnp.abs(ratio2 - 1.0) < 1e-6
    es = jnp.where(reg0, esl, jnp.where(reg1, esi,
                                        (1.0 - ratio2) * esl + ratio2 * esi))
    es = jnp.minimum(es, 0.99 * p)
    qs = EP2 * es / (p - es)
    pi_ = (1e5 / p) ** (0.2854 * (1.0 - 0.28 * qs))
    expo = jnp.where(
        reg0, (3374.6525 / t - 2.5403) * qs * (1.0 + 0.81 * qs),
        jnp.where(reg1, (3114.834 / t - 0.278296) * qs * (1.0 + 0.81 * qs),
                  rl * qs * C5 / t * (1.0 + 0.81 * qs)))
    return t * pi_ * jnp.exp(expo), qs


def _wetbulb(p, thtu, tu, ratio2, rl, tol):
    """Secant iteration for wet-bulb T from theta-e (TPMIX loop,
    cu_kf.f90:2300-2345; also TPDD with ratio2=0). Returns (t, qs)."""
    thtgs0, qs0 = _thtgs(tu, p, ratio2, rl)
    f0 = thtgs0 - thtu
    t_cur = tu - 0.5 * f0

    def body(_, c):
        t_cur, t_prev, f_prev, t_res, qs_res, done = c
        thtgs, qs_e = _thtgs(t_cur, p, ratio2, rl)
        f1 = thtgs - thtu
        t_res = jnp.where(done, t_res, t_cur)
        qs_res = jnp.where(done, qs_res, qs_e)
        newdone = done | (jnp.abs(f1) < tol)
        dtt = f1 * _sd(t_cur - t_prev, f1 - f_prev)
        t_next = t_cur - dtt
        t_prev = jnp.where(newdone, t_prev, t_cur)
        f_prev = jnp.where(newdone, f_prev, f1)
        t_cur = jnp.where(newdone, t_cur, t_next)
        return (t_cur, t_prev, f_prev, t_res, qs_res, newdone)

    c = (t_cur, tu, f0, t_cur, qs0, jnp.asarray(False))
    c = jax.lax.fori_loop(0, 11, body, c)
    return c[3], c[4]


def _tpmix(p, thtu, tu, qu, qliq, qice, ratio2, rl):
    """Wet-bulb extraction + condensation/evaporation bookkeeping
    (TPMIX, cu_kf.f90:2245-2440).

    Returns (tu, qu, qliq, qice, qnewlq, qnewic)."""
    t1, qs = _wetbulb(p, thtu, tu, ratio2, rl, 0.01)
    reg0 = ratio2 < 1e-6
    reg1 = jnp.abs(ratio2 - 1.0) < 1e-6

    sup = qs <= qu
    qnew = jnp.where(sup, qu - qs, 0.0)

    # sub-saturated: evaporate available liquid/ice (":2360-2430")
    dq = qs - qu
    qtot = qliq + qice
    enough = qtot >= dq
    ql_e = qliq - (1.0 - ratio2) * dq
    dqice = jnp.maximum(-ql_e, 0.0)
    ql_e = jnp.maximum(ql_e, 0.0)
    qi_e = qice - ratio2 * dq + dqice
    dqliq = jnp.maximum(-qi_e, 0.0)
    qi_e = jnp.maximum(qi_e, 0.0)
    ql_e = ql_e + dqliq

    rll = jnp.where(reg0, XLV0 - XLV1 * t1,
                    jnp.where(reg1, XLS0 - XLS1 * t1, rl))
    ccp = 1005.7 * (1.0 + 0.89 * qu)
    no_cond = qtot < 1e-10
    t_nc = t1 + rll * (dq / (1.0 + dq)) / ccp
    t_sc = t1 + rll * ((dq - qtot) / (1.0 + dq - qtot)) / ccp
    qu_sc = qu + qtot

    t_out = jnp.where(sup, t1,
                      jnp.where(enough, t1, jnp.where(no_cond, t_nc, t_sc)))
    qu_out = jnp.where(sup, qs,
                       jnp.where(enough, qs, jnp.where(no_cond, qu, qu_sc)))
    ql_out = jnp.where(sup, qliq, jnp.where(enough, ql_e, 0.0))
    qi_out = jnp.where(sup, qice, jnp.where(enough, qi_e, 0.0))
    return (t_out, qu_out, ql_out, qi_out,
            (1.0 - ratio2) * qnew, ratio2 * qnew)


def _condload(qliq, qice, wtw, dzz, boterm, enterm, qnewlq, qnewic):
    """Ogura-Cho precipitation fallout + vertical velocity update
    (CONDLOAD, cu_kf.f90:2023-2088).

    Returns (qliq, qice, wtw, qlqout, qicout)."""
    qtot = qliq + qice
    qnew = qnewlq + qnewic
    qest = 0.5 * (qtot + qnew)
    g1 = jnp.maximum(wtw + boterm - enterm - 2.0 * G * dzz * qest / 1.5, 0.0)
    wavg = (jnp.sqrt(jnp.maximum(wtw, 0.0)) + jnp.sqrt(g1)) / 2.0
    conv = RATE * dzz / jnp.maximum(wavg, 1e-10)
    ratio3 = qnewlq / (qnew + 1e-10)
    qtot = qtot + 0.6 * qnew
    oldq = qtot
    ratio4 = (0.6 * qnewlq + qliq) / (qtot + 1e-10)
    qtot = qtot * jnp.exp(-conv)
    dq = oldq - qtot
    qlqout = ratio4 * dq
    qicout = (1.0 - ratio4) * dq
    pptdrg = 0.5 * (oldq + qtot - 0.2 * qnew)
    wtw = wtw + boterm - enterm - 2.0 * G * dzz * pptdrg / 1.5
    qliq = ratio4 * qtot + ratio3 * 0.4 * qnew
    qice = (1.0 - ratio4) * qtot + (1.0 - ratio3) * 0.4 * qnew
    return qliq, qice, wtw, qlqout, qicout


def _dtfrznew(tu, p, qvap, qliq, qice, qnwfrz, frc1, effq, iflag):
    """Linear glaciation of the updraft between TTFRZ and TBFRZ
    (DTFRZNEW, cu_kf.f90:2091-2190).

    Returns (tu, theteu, qvap, qliq, qice, ratio2, rl, iflag)."""
    qlqfrz = qliq * effq
    qnew = qnwfrz * effq * 0.5
    esliq = _esl(tu)
    esice = _esi(tu)
    rls = 2833922.0 - 259.532 * (tu - 273.16)
    rlf = rls - (2.5e6 - 2369.276 * (tu - 273.16))
    ccp = 1005.7 * (1.0 + 0.89 * qvap)
    a = (CICEK - BICE * DICE) / ((tu - DICE) * (tu - DICE))
    b = rls * EP2 / p
    c = a * b * esice / ccp
    dqvap = (b * (esliq - esice) / (rls + rls * c)
             - rlf * (qlqfrz + qnew) / (rls + rls / c))
    dtfrz = (rlf * (qlqfrz + qnew) + b * (esliq - esice)) / (ccp + a * b
                                                             * esice)
    tu1, qvap1 = tu, qvap
    tu = tu + frc1 * dtfrz
    qvap = qvap - frc1 * dqvap
    es = qvap * p / (EP2 + qvap)
    ratio2 = _sd(_esl(tu) - es, _esl(tu) - _esi(tu))

    # adjust FRC1 so glaciation is neither under- nor over-counted
    # (":2152-2170"); both paths force ratio2=1, iflag=1
    cond1 = (iflag > 0) & (ratio2 < 1.0)
    cond2 = (~cond1) & (ratio2 > 1.0)
    frc1_adj = jnp.where(cond1, frc1 + (1.0 - ratio2),
                         jnp.where(cond2, jnp.maximum(frc1 - (ratio2 - 1.0),
                                                      0.0), frc1))
    adj = cond1 | cond2
    tu = jnp.where(adj, tu1 + frc1_adj * dtfrz, tu)
    qvap = jnp.where(adj, qvap1 - frc1_adj * dqvap, qvap)
    ratio2 = jnp.where(adj, 1.0, ratio2)
    iflag = jnp.where(adj, 1, iflag)
    frc1 = frc1_adj

    rlc = XLV0 - XLV1 * tu
    rls = XLS0 - XLS1 * tu
    rl = ratio2 * rls + (1.0 - ratio2) * rlc
    pi_ = (1e5 / p) ** (0.2854 * (1.0 - 0.28 * qvap))
    theteu = tu * pi_ * jnp.exp(rl * qvap * C5 / tu * (1.0 + 0.81 * qvap))
    full = iflag == 1
    qice_out = jnp.where(full, qice + frc1 * dqvap + qliq,
                         qice + frc1 * (dqvap + qlqfrz))
    qliq_out = jnp.where(full, 0.0, qliq - frc1 * qlqfrz)
    return tu, theteu, qvap, qliq_out, qice_out, ratio2, rl, iflag


def _prof5(eq):
    """Gaussian mixing profile integral (PROF5, cu_kf.f90:2194-2235).
    Returns (ee, ud)."""
    sqrt2p, a1, a2, a3 = 2.506628, 0.4361836, -0.1201676, 0.9372980
    pp, sigma, fe = 0.33267, 0.166666667, 0.202765151
    y = 6.0 * eq - 3.0
    ey = jnp.exp(y * y / (-2.0))
    e45 = jnp.exp(-4.5)
    t2 = 1.0 / (1.0 + pp * jnp.abs(y))
    t1 = 0.500498
    c1 = a1 * t1 + a2 * t1 * t1 + a3 * t1 ** 3
    c2 = a1 * t2 + a2 * t2 * t2 + a3 * t2 ** 3
    pos = y >= 0.0
    ee = jnp.where(
        pos,
        sigma * (0.5 * (sqrt2p - e45 * c1 - ey * c2) + sigma * (e45 - ey))
        - e45 * eq * eq / 2.0,
        sigma * (0.5 * (ey * c2 - e45 * c1) + sigma * (e45 - ey))
        - e45 * eq * eq / 2.0)
    ud = jnp.where(
        pos,
        sigma * (0.5 * (ey * c2 - e45 * c1) + sigma * (e45 - ey))
        - e45 * (0.5 + eq * eq / 2.0 - eq),
        sigma * (0.5 * (sqrt2p - e45 * c1 - ey * c2) + sigma * (e45 - ey))
        - e45 * (0.5 + eq * eq / 2.0 - eq))
    return ee / fe, ud / fe


def _envirtht(p1, t1, q1, r1, rl):
    """Environmental theta-e for glaciation fraction r1
    (ENVIRTHT, cu_kf.f90:2443-2490)."""
    ee = q1 * p1 / (EP2 + q1)
    ee = jnp.maximum(ee, 1e-10)
    tlog = jnp.log(ee / ALIQ)
    tdpt = (CLIQK - DLIQ * tlog) / (BLIQ - tlog)
    tsatlq = tdpt - (0.212 + 1.571e-3 * (tdpt - T00)
                     - 4.36e-4 * (t1 - T00)) * (t1 - tdpt)
    tlogic = jnp.log(ee / AICE)
    tfpt = (CICEK - DICE * tlogic) / (BICE - tlogic)
    tsatic = tfpt - (0.182 + 1.13e-3 * (tfpt - T00)
                     - 3.58e-4 * (t1 - T00)) * (t1 - tfpt)
    tht = t1 * (P00 / p1) ** (0.2854 * (1.0 - 0.28 * q1))
    reg0 = r1 < 1e-6
    reg1 = jnp.abs(r1 - 1.0) < 1e-6
    tsat = r1 * tsatic + (1.0 - r1) * tsatlq
    expo = jnp.where(
        reg0, (3374.6525 / tsatlq - 2.5403) * q1 * (1.0 + 0.81 * q1),
        jnp.where(reg1, (3114.834 / tsatic - 0.278296) * q1
                  * (1.0 + 0.81 * q1),
                  rl * q1 * C5 / tsat * (1.0 + 0.81 * q1)))
    return tht * jnp.exp(expo)


def _theta_e(t, p, q, tsat):
    """theta-e given saturation temperature (Bolton form used throughout
    KFPARA, e.g. cu_kf.f90:617-619)."""
    return (t * (1e5 / p) ** (0.2854 * (1.0 - 0.28 * q))
            * jnp.exp((3374.6525 / tsat - 2.5403) * q * (1.0 + 0.81 * q)))


def _kf_column(u0, v0, t0, qv0, p0, rho, dzq, w0avg, dt, dx):
    """KFPARA for one column (cu_kf.f90:308-2020).

    All profile args are (nz,) with level 0 at the surface. Returns a
    dict with tendencies dtdt/dqdt/dqcdt/dqrdt/dqidt/dqsdt [per s],
    pratec [mm/s], nca [s], triggered [bool]."""
    nz = t0.shape[0]
    kidx = jnp.arange(nz)
    dxsq = dx * dx
    f8 = jnp.float32

    # --- sounding setup (":478-516") ------------------------------------
    es = _esl(t0)
    qes = EP2 * es / (p0 - es)
    q0 = jnp.clip(qv0, 1e-6, qes)
    tv0 = t0 * (1.0 + B61 * q0)
    dp = rho * G * dzq
    z0 = jnp.cumsum(dzq) - 0.5 * dzq
    dza = jnp.concatenate([z0[1:] - z0[:-1], jnp.zeros(1, z0.dtype)])
    p300 = p0[0] - 30000.0
    ml = jnp.max(jnp.where(t0 > T00, kidx + 1, 0))          # 0 = none
    l5 = jnp.maximum(jnp.max(jnp.where(p0 >= 500e2, kidx, 0)), 0)
    llfc = jnp.max(jnp.where(p0 >= p300, kidx, 0))
    ems = dp * dxsq / G
    emsd = 1.0 / ems
    thta0 = t0 * (P00 / p0) ** (0.2854 * (1.0 - 0.28 * q0))

    zeros = jnp.zeros(nz, f8)

    # ======== trigger search + updraft (":517-918", GOTO 25 loop) =======
    arr_names = ("umf", "uer", "udr", "detlq", "detic", "pptliq", "pptice",
                 "qliq", "qice", "qlqout", "qicout", "ratio2", "theteu",
                 "thetee", "thtes", "tua", "tvu", "qua", "wua", "qdt",
                 "eqfrc")

    def init_carry():
        c = {n: zeros for n in arr_names}
        c.update(kmix=jnp.int32(0), status=jnp.int32(0), lc=jnp.int32(0),
                 kpbl=jnp.int32(0), klcl=jnp.int32(1), kk=jnp.int32(0),
                 dpthmx=f8(1.0), tmix=f8(273.0), qmix=f8(0.0),
                 zmix=f8(0.0), pmix=f8(9e4), tlcl=f8(270.0), plcl=f8(9e4),
                 tvlcl=f8(270.0), tven=f8(270.0), zlcl=f8(0.0),
                 wlcl=f8(0.0), abe=f8(0.0), trppt=f8(0.0), upold=f8(1.0),
                 upnew=f8(1.0), vmflcl=f8(0.0), thtudl=f8(300.0),
                 ltop=jnp.int32(1), let=jnp.int32(1), rl=f8(2.5e6),
                 iflag=jnp.int32(0))
        return c

    def search_cond(c):
        return c["status"] == 0

    def search_body(c):
        lc = c["kmix"]
        fail_llfc = lc > llfc

        # 60-mb source layer (":522-531")
        above = kidx >= lc
        cum = jnp.cumsum(jnp.where(above, dp, 0.0))
        deep = above & (cum > 6e3)
        kpbl = jnp.min(jnp.where(deep, kidx, nz))
        fail_depth = kpbl >= nz
        kpbl = jnp.minimum(kpbl, nz - 1)

        # mass-weighted mixture (":533-556")
        msk = above & (kidx <= kpbl)
        mw = jnp.where(msk, dp, 0.0)
        dpthmx = jnp.sum(mw)
        rocpq_k = 0.2854 * (1.0 - 0.28 * q0)
        thmix = jnp.sum(mw * t0 * (P00 / p0) ** rocpq_k) / dpthmx
        qmix = jnp.sum(mw * q0) / dpthmx
        zmix = jnp.sum(mw * z0) / dpthmx
        pmix = jnp.sum(mw * p0) / dpthmx
        rocpq = 0.2854 * (1.0 - 0.28 * qmix)
        tmix = thmix * (pmix / P00) ** rocpq
        emix = qmix * pmix / (EP2 + qmix)
        tlog = jnp.log(emix / ALIQ)
        tdpt = (CLIQK - DLIQ * tlog) / (BLIQ - tlog)
        tlcl = tdpt - (0.212 + 1.571e-3 * (tdpt - T00)
                       - 4.36e-4 * (tmix - T00)) * (tmix - tdpt)
        tlcl = jnp.minimum(tlcl, tmix)
        tvlcl = tlcl * (1.0 + 0.608 * qmix)
        plcl = P00 * (tlcl / thmix) ** (1.0 / rocpq)

        # LCL level (":560-566")
        hit = above & (plcl >= p0)
        klcl = jnp.min(jnp.where(hit, kidx, nz))
        fail_lcl = klcl >= nz
        klcl = jnp.clip(klcl, 1, nz - 1)
        kk = klcl - 1
        dlp = jnp.log(plcl / p0[kk]) / jnp.log(p0[klcl] / p0[kk])
        tenv = t0[kk] + (t0[klcl] - t0[kk]) * dlp
        qenv = q0[kk] + (q0[klcl] - q0[kk]) * dlp
        tven = tenv * (1.0 + 0.608 * qenv)
        zlcl = z0[kk] + (z0[klcl] - z0[kk]) * dlp

        # Fritsch-Chappell trigger (":594-612")
        wklcl = 0.02 * zlcl / 2.5e3
        wkl = (w0avg[kk] + (w0avg[klcl] - w0avg[kk]) * dlp) * dx / 25e3 \
            - wklcl
        wabs = jnp.abs(wkl) + 1e-10
        wsigne = wkl / wabs
        dtlcl = 4.64 * wsigne * wabs ** 0.33
        gdt = G * dtlcl * (zlcl - z0[lc]) / (tv0[lc] + tven)
        wlcl = 1.0 + 0.5 * wsigne * jnp.sqrt(jnp.abs(gdt) + 1e-10)
        no_trigger = tlcl + dtlcl <= tenv

        theteu_k = _theta_e(tmix, pmix, qmix, tlcl)
        es_env = _esl(tenv)
        tvavg = 0.5 * (tv0[klcl] + tenv * (1.0 + 0.608 * qenv))
        plcl2 = p0[klcl] * jnp.exp(G / (R * tvavg) * (z0[klcl] - zlcl))
        qese = EP2 * es_env / (plcl2 - es_env)
        thtes_k = _theta_e(tenv, plcl2, qese, tenv)
        wtw0 = wlcl * wlcl
        neg_wlcl = wlcl < 0.0
        rholcl = plcl2 / (R * tvlcl)

        # --- updraft ascent loop (":660-918") ----------------------------
        a = {n: zeros for n in arr_names}
        a["wua"] = a["wua"].at[kk].set(wlcl)
        vmflcl = rholcl * AU0
        a["umf"] = a["umf"].at[kk].set(vmflcl)
        a["tua"] = a["tua"].at[kk].set(tlcl)
        a["tvu"] = a["tvu"].at[kk].set(tvlcl)
        a["qua"] = a["qua"].at[kk].set(qmix)
        a["eqfrc"] = a["eqfrc"].at[kk].set(1.0)
        a["theteu"] = a["theteu"].at[kk].set(theteu_k)
        a["thtes"] = a["thtes"].at[kk].set(thtes_k)

        up = dict(a)
        up.update(wtw=wtw0, ttemp=f8(TTFRZ), iflag=jnp.int32(0),
                  abe=f8(0.0), trppt=f8(0.0), upold=vmflcl, upnew=vmflcl,
                  ee1=f8(1.0), ud1=f8(0.0), let=klcl, ltop=jnp.int32(nz - 1),
                  rl=f8(2.5e6), alive=jnp.asarray(True))

        def up_body(nk, u):
            nk1 = nk + 1
            run = u["alive"] & (nk >= kk)

            frc1 = f8(0.0)
            theteu_n = u["theteu"][nk]
            qu_n = u["qua"][nk]
            ql_n = u["qliq"][nk]
            qi_n = u["qice"][nk]
            r2_n = u["ratio2"][nk]
            tu_n, qu_n, ql_n, qi_n, qnewlq, qnewic = _tpmix(
                p0[nk1], theteu_n, t0[nk1], qu_n, ql_n, qi_n, r2_n,
                u["rl"])
            tvu_n = tu_n * (1.0 + 0.608 * qu_n)

            # glaciation interval bookkeeping (":722-737")
            in_frz = (tu_n <= TTFRZ) & (u["iflag"] < 1)
            upper = tu_n > TBFRZ
            ttemp_c = jnp.where(u["ttemp"] > TTFRZ, f8(TTFRZ), u["ttemp"])
            frc1 = jnp.where(in_frz,
                             jnp.where(upper,
                                       (ttemp_c - tu_n) / (TTFRZ - TBFRZ),
                                       (ttemp_c - TBFRZ) / (TTFRZ - TBFRZ)),
                             frc1)
            r1 = jnp.where(upper, (ttemp_c - tu_n)
                           / jnp.maximum(ttemp_c - TBFRZ, 1e-10), 1.0)
            iflag_new = jnp.where(in_frz & ~upper, 1, u["iflag"])
            qnwfrz = jnp.where(in_frz, qnewlq, 0.0)
            qnewic = jnp.where(in_frz, qnewic + qnewlq * r1 * 0.5, qnewic)
            qnewlq = jnp.where(in_frz, qnewlq - qnewlq * r1 * 0.5, qnewlq)
            effq = jnp.where(in_frz, (TTFRZ - TBFRZ)
                             / jnp.maximum(ttemp_c - TBFRZ, 1e-10), 1.0)
            ttemp_new = jnp.where(in_frz, tu_n, u["ttemp"])

            # buoyancy + fallout (":739-756")
            first = nk == kk
            be = jnp.where(first,
                           (tvlcl + tvu_n) / (tven + tv0[nk1]) - 1.0,
                           (u["tvu"][nk] + tvu_n)
                           / (tv0[nk] + tv0[nk1]) - 1.0)
            dzz = jnp.where(first, z0[nk1] - zlcl, dza[nk])
            boterm = 2.0 * dzz * G * be / 1.5
            enterm = jnp.where(first, 0.0,
                               2.0 * u["uer"][nk] * u["wtw"] / u["upold"])
            ql_n, qi_n, wtw, qlqout_n, qicout_n = _condload(
                ql_n, qi_n, u["wtw"], dzz, boterm, enterm, qnewlq, qnewic)
            exit_a = wtw <= 0.0

            wu_n = wtw / jnp.sqrt(jnp.abs(wtw) + 1e-20)
            thtes_n = _theta_e(t0[nk1], p0[nk1], qes[nk1], t0[nk1])
            udlbe = ((2.0 * theteu_k)
                     / (u["thtes"][nk] + thtes_n) - 1.0) * dzz
            abe = u["abe"] + jnp.where(udlbe > 0.0, udlbe * G, 0.0)

            # glaciation adjustment (":770-776")
            do_frz = frc1 > 1e-6
            (tu_f, theteu_f, qu_f, ql_f, qi_f, r2_f, rl_f,
             iflag_f) = _dtfrznew(tu_n, p0[nk1], qu_n, ql_n, qi_n,
                                  qnwfrz, frc1, effq, iflag_new)
            tu_n = jnp.where(do_frz, tu_f, tu_n)
            theteu_n = jnp.where(do_frz, theteu_f, theteu_n)
            qu_n = jnp.where(do_frz, qu_f, qu_n)
            ql_n = jnp.where(do_frz, ql_f, ql_n)
            qi_n = jnp.where(do_frz, qi_f, qi_n)
            r2_n = jnp.where(do_frz, r2_f, r2_n)
            rl = jnp.where(do_frz, rl_f, u["rl"])
            iflag_new = jnp.where(do_frz, iflag_f, iflag_new)

            thetee_n = _envirtht(p0[nk1], t0[nk1], q0[nk1], r2_n, rl)

            rei = vmflcl * dp[nk1] * 0.03 / RAD_KF
            tvqu_n = tu_n * (1.0 + 0.608 * qu_n - ql_n - qi_n)

            # entrainment/detrainment from the critical mixed fraction
            # (":793-861")
            cold = tvqu_n <= tv0[nk1]
            f1a = 0.95
            th95 = f1a * thetee_n + (1.0 - f1a) * theteu_n
            q95 = f1a * q0[nk1] + (1.0 - f1a) * qu_n
            t95, q95o, _, _, _, _ = _tpmix(
                p0[nk1], th95, tvqu_n, q95, (1.0 - f1a) * ql_n,
                (1.0 - f1a) * qi_n, r2_n, rl)
            tu95 = t95 * (1.0 + 0.608 * q95o)
            f1b = 0.10
            th10 = f1b * thetee_n + (1.0 - f1b) * theteu_n
            q10 = f1b * q0[nk1] + (1.0 - f1b) * qu_n
            t10, q10o, tl10, ti10, _, _ = _tpmix(
                p0[nk1], th10, tvqu_n, q10, (1.0 - f1b) * ql_n,
                (1.0 - f1b) * qi_n, r2_n, rl)
            tu10 = t10 * (1.0 + 0.608 * q10o - tl10 - ti10)
            eqfrc_raw = jnp.clip((tv0[nk1] - tvqu_n) * f1b
                                 * _sd(1.0, tu10 - tvqu_n), 0.0, 1.0)
            all_ent = (tu95 > tv0[nk1]) | (tu10 == tvqu_n) \
                | (eqfrc_raw == 1.0)
            all_det = (~all_ent) & (eqfrc_raw == 0.0)
            ee5, ud5 = _prof5(eqfrc_raw)
            ee2 = jnp.where(all_ent, 1.0, jnp.where(all_det, 0.0, ee5))
            ud2 = jnp.where(all_ent, 0.0, jnp.where(all_det, 1.0, ud5))
            eqfrc_n = jnp.where(all_ent, 1.0,
                                jnp.where(all_det, 0.0, eqfrc_raw))
            ee2 = jnp.where(cold, 0.0, ee2)
            ud2 = jnp.where(cold, 1.0, ud2)
            eqfrc_n = jnp.where(cold, 0.0, eqfrc_n)
            let = jnp.where(cold, u["let"], nk1)

            ee1 = jnp.where(first, 1.0, u["ee1"])
            ud1 = jnp.where(first, 0.0, u["ud1"])
            uer_n = jnp.where(cold, 0.0, 0.5 * rei * (ee1 + ee2))
            udr_n = jnp.where(cold, rei, 0.5 * rei * (ud1 + ud2))

            # detrainment exceeds flux: total detrainment exit (":864-875")
            exit_b = (u["umf"][nk] - udr_n) < 10.0
            abe = jnp.where(exit_b & (udlbe > 0.0), abe - udlbe * G, abe)
            # exit_a (w <= 0) skips the ABE/LET updates entirely (":757")
            abe = jnp.where(exit_a, u["abe"], abe)
            let = jnp.where(exit_b, nk, let)
            let = jnp.where(exit_a, u["let"], let)

            upold = u["umf"][nk] - udr_n
            upnew = upold + uer_n
            detlq_n = ql_n * udr_n
            detic_n = qi_n * udr_n
            qdt_n = qu_n
            qu_mix = (upold * qu_n + uer_n * q0[nk1]) / upnew
            theteu_mix = (theteu_n * upold + thetee_n * uer_n) / upnew
            ql_mix = ql_n * upold / upnew
            qi_mix = qi_n * upold / upnew
            pptliq_n = qlqout_n * upold
            pptice_n = qicout_n * upold
            trppt = u["trppt"] + pptliq_n + pptice_n
            uer_n = jnp.where(nk1 <= kpbl,
                              uer_n + vmflcl * dp[nk1] / dpthmx, uer_n)

            stop = exit_a | exit_b
            ok = run & ~stop
            new = dict(u)
            # level nk1 writes: tua/tvu/ratio2 were set before the w<=0
            # check (":700-737"); the rest only after it (GOTO 65 skips)
            wr_a = run & ~exit_a          # survived the w check
            r2_write = jnp.where(exit_a, u["ratio2"][nk], r2_n)
            new["ratio2"] = jnp.where(run,
                                      u["ratio2"].at[nk1].set(r2_write),
                                      u["ratio2"])
            for name, val in (("tua", tu_n), ("tvu", tvu_n),
                              ("qlqout", qlqout_n), ("qicout", qicout_n),
                              ("wua", wu_n), ("uer", uer_n),
                              ("udr", udr_n)):
                new[name] = jnp.where(wr_a, u[name].at[nk1].set(val),
                                      u[name])
            new["thtes"] = jnp.where(wr_a, u["thtes"].at[nk1].set(thtes_n),
                                     u["thtes"])
            new["thetee"] = jnp.where(wr_a,
                                      u["thetee"].at[nk1].set(thetee_n),
                                      u["thetee"])
            new["eqfrc"] = jnp.where(wr_a, u["eqfrc"].at[nk1].set(eqfrc_n),
                                     u["eqfrc"])
            for name, val in (("umf", upnew), ("detlq", detlq_n),
                              ("detic", detic_n), ("qdt", qdt_n),
                              ("qua", qu_mix), ("theteu", theteu_mix),
                              ("qliq", ql_mix), ("qice", qi_mix),
                              ("pptliq", pptliq_n), ("pptice", pptice_n)):
                new[name] = jnp.where(ok, u[name].at[nk1].set(val), u[name])
            # on exit the nk1 slots keep the just-computed (pre-mixing)
            # parcel state, as the Fortran in-place arrays do
            for name, val in (("qliq", ql_n), ("qice", qi_n),
                              ("qua", qu_n), ("theteu", theteu_n)):
                new[name] = jnp.where(run & stop,
                                      u[name].at[nk1].set(val), new[name])

            new["wtw"] = jnp.where(ok, wtw, u["wtw"])
            new["ttemp"] = jnp.where(ok, ttemp_new, u["ttemp"])
            new["iflag"] = jnp.where(ok, iflag_new, u["iflag"])
            new["abe"] = jnp.where(run, abe, u["abe"])
            new["trppt"] = jnp.where(ok, trppt, u["trppt"])
            new["upold"] = jnp.where(ok, upold, u["upold"])
            new["upnew"] = jnp.where(ok, upnew, u["upnew"])
            new["ee1"] = jnp.where(ok, ee2, u["ee1"])
            new["ud1"] = jnp.where(ok, ud2, u["ud1"])
            new["let"] = jnp.where(run, let, u["let"])
            new["rl"] = jnp.where(ok, rl, u["rl"])
            new["ltop"] = jnp.where(run & stop, nk, u["ltop"])
            new["alive"] = u["alive"] & ~(run & stop)
            return new

        up = jax.lax.fori_loop(kk, nz - 1, up_body, up)

        ltop = up["ltop"]
        cldhgt = z0[ltop] - zlcl
        shallow = (cldhgt < 3e3) | (up["abe"] < 1.0)

        trig = (~no_trigger) & (~neg_wlcl)
        this_fail = fail_llfc | fail_depth | fail_lcl
        retry = (~this_fail) & ((no_trigger & (kpbl < llfc)) | neg_wlcl
                                | (trig & shallow))
        success = trig & ~shallow & ~this_fail
        give_up = this_fail | (no_trigger & (kpbl >= llfc))

        out = dict(c)
        out["kmix"] = lc + 1
        out["status"] = jnp.where(success, 1,
                                  jnp.where(give_up, 2, 0)).astype(jnp.int32)
        # save everything on success (values are garbage otherwise but
        # the final mask kills them)
        for n in arr_names:
            out[n] = up[n]
        out.update(lc=lc, kpbl=kpbl, klcl=klcl, kk=kk, dpthmx=dpthmx,
                   tmix=tmix, qmix=qmix, zmix=zmix, pmix=pmix, tlcl=tlcl,
                   plcl=plcl, tvlcl=tvlcl, tven=tven, zlcl=zlcl, wlcl=wlcl,
                   abe=up["abe"], trppt=up["trppt"], upold=up["upold"],
                   upnew=up["upnew"], vmflcl=vmflcl, thtudl=theteu_k,
                   ltop=ltop, let=jnp.minimum(up["let"], ltop),
                   rl=up["rl"], iflag=up["iflag"])
        return out

    c = jax.lax.while_loop(search_cond, search_body, init_carry())
    triggered = c["status"] == 1

    # unpack (names shadow the Fortran ones)
    umf, uer, udr = c["umf"], c["uer"], c["udr"]
    detlq, detic = c["detlq"], c["detic"]
    pptliq, pptice = c["pptliq"], c["pptice"]
    qliq, qice = c["qliq"], c["qice"]
    qlqout, qicout = c["qlqout"], c["qicout"]
    ratio2, theteu, thetee, thtes = (c["ratio2"], c["theteu"], c["thetee"],
                                     c["thtes"])
    tua, qua, qdt, eqfrc = c["tua"], c["qua"], c["qdt"], c["eqfrc"]
    lc, kpbl, klcl, kk = c["lc"], c["kpbl"], c["klcl"], c["kk"]
    ltop, let = c["ltop"], c["let"]
    dpthmx, tmix, qmix, zmix = c["dpthmx"], c["tmix"], c["qmix"], c["zmix"]
    vmflcl, wlcl, zlcl = c["vmflcl"], c["wlcl"], c["zlcl"]
    thtudl, abe, trppt = c["thtudl"], c["abe"], c["trppt"]
    upold, upnew = c["upold"], c["upnew"]

    # --- mass-flux profile adjustments above the LET (":925-962") -------
    same = let == ltop
    udr_lt = jnp.where(same, umf[ltop] + udr[ltop] - uer[ltop], udr[ltop])
    detlq_lt = jnp.where(same, qliq[ltop] * udr_lt * upnew / upold,
                         detlq[ltop])
    detic_lt = jnp.where(same, qice[ltop] * udr_lt * upnew / upold,
                         detic[ltop])
    trppt = jnp.where(same, trppt - pptliq[ltop] - pptice[ltop], trppt)
    udr = udr.at[ltop].set(udr_lt)
    detlq = detlq.at[ltop].set(detlq_lt)
    detic = detic.at[ltop].set(detic_lt)
    uer = jnp.where(same & (kidx == ltop), 0.0, uer)
    umf = jnp.where(same & (kidx == ltop), 0.0, umf)
    pptliq = jnp.where(same & (kidx == ltop), 0.0, pptliq)
    pptice = jnp.where(same & (kidx == ltop), 0.0, pptice)

    top_msk = (~same) & (kidx > let) & (kidx <= ltop)
    dptt = jnp.sum(jnp.where(top_msk, dp, 0.0))
    dumfdp = umf[let] / jnp.maximum(dptt, 1e-10)
    udr_top = dp * dumfdp
    umf_top = umf[let] - jnp.cumsum(jnp.where(top_msk, udr_top, 0.0))
    trppt = trppt + jnp.sum(jnp.where(
        top_msk, umf_top * (qlqout + qicout) - pptliq - pptice, 0.0))
    udr = jnp.where(top_msk, udr_top, udr)
    umf = jnp.where(top_msk, umf_top, umf)
    detlq = jnp.where(top_msk, qliq * udr, detlq)
    detic = jnp.where(top_msk, qice * udr, detic)
    pptliq = jnp.where(top_msk, umf * qlqout, pptliq)
    pptice = jnp.where(top_msk, umf * qicout, pptice)

    # --- extend below the LCL / zero above cloud top (":966-1050";
    # DO 90 runs over levels 1..K inclusive) ------------------------------
    below = kidx <= kk
    src = below & (kidx >= lc)
    in_pbl = src & (kidx <= kpbl)
    uer_b = jnp.where(in_pbl, vmflcl * dp / dpthmx, 0.0)
    umf_b = jnp.where(src, jnp.minimum(jnp.cumsum(uer_b), vmflcl), 0.0)
    umf_b = jnp.where(src & (kidx > kpbl), vmflcl, umf_b)
    tua = jnp.where(below, jnp.where(src, tmix + (z0 - zmix) * GDRY, 0.0),
                    tua)
    qua = jnp.where(below, jnp.where(src, qmix, 0.0), qua)
    umf = jnp.where(below, umf_b, umf)
    uer = jnp.where(below, uer_b, uer)
    for_zero = (udr, qdt, qliq, qice, qlqout, qicout, pptliq, pptice,
                detlq, detic, ratio2)
    (udr, qdt, qliq, qice, qlqout, qicout, pptliq, pptice, detlq, detic,
     ratio2) = [jnp.where(below, 0.0, x) for x in for_zero]
    # theta-e of the sub-cloud environment (":1007-1017")
    ee_b = jnp.maximum(q0 * p0 / (EP2 + q0), 1e-10)
    tlog_b = jnp.log(ee_b / ALIQ)
    tdpt_b = (CLIQK - DLIQ * tlog_b) / (BLIQ - tlog_b)
    tsat_b = tdpt_b - (0.212 + 1.571e-3 * (tdpt_b - T00)
                       - 4.36e-4 * (t0 - T00)) * (t0 - tdpt_b)
    thetee = jnp.where(below, _theta_e(t0, p0, q0, tsat_b), thetee)
    thtes = jnp.where(below, _theta_e(t0, p0, qes, t0), thtes)
    eqfrc = jnp.where(below, 1.0, eqfrc)

    above_top = kidx > ltop
    (umf, uer, udr, qdt, qliq, qice, qlqout, qicout, detlq, detic, pptliq,
     pptice) = [jnp.where(above_top, 0.0, x) for x in
                (umf, uer, udr, qdt, qliq, qice, qlqout, qicout, detlq,
                 detic, pptliq, pptice)]
    tua = jnp.where(kidx > ltop + 1, 0.0, tua)
    qua = jnp.where(kidx > ltop + 1, 0.0, qua)

    thtau = tua * (P00 / p0) ** (0.2854 * (1.0 - 0.28 * qdt))

    # moisture-flux level for precipitation efficiency (":1040-1055")
    p150 = p0[klcl] - 1.5e4
    lvf = jnp.max(jnp.where((kidx <= ltop) & (p0 > p150), kidx, 0))
    lvf = jnp.minimum(jnp.minimum(lvf, let), nz - 2)
    usr = umf[lvf + 1] * (qua[lvf + 1] + qliq[lvf + 1] + qice[lvf + 1])
    usr = jnp.minimum(usr, trppt)
    usr = jnp.where(usr < 1e-8, trppt, usr)

    # --- convective time scale + precipitation efficiency (":1100-1150")
    wspd_klcl = jnp.sqrt(u0[klcl] ** 2 + v0[klcl] ** 2)
    wspd_l5 = jnp.sqrt(u0[l5] ** 2 + v0[l5] ** 2)
    wspd_ltop = jnp.sqrt(u0[ltop] ** 2 + v0[ltop] ** 2)
    vconv = 0.5 * (wspd_klcl + wspd_l5)
    timec = jnp.where(vconv > 0.0, dx / jnp.maximum(vconv, 1e-10), 3600.0)
    tadvec = timec
    timec = jnp.clip(timec, 1800.0, 3600.0)
    nic = jnp.round(timec / dt)
    timec = nic * dt

    shsign = jnp.where(wspd_ltop > wspd_klcl, 1.0, -1.0)
    vws = ((u0[ltop] - u0[klcl]) ** 2 + (v0[ltop] - v0[klcl]) ** 2)
    vws = 1e3 * shsign * jnp.sqrt(vws) / jnp.maximum(z0[ltop] - z0[klcl],
                                                     1.0)
    pef = jnp.clip(1.591 + vws * (-0.639 + vws * (9.53e-2 - vws * 4.96e-3)),
                   0.2, 0.9)
    cbh = (zlcl - z0[0]) * 3.281e-3
    rcbh = jnp.where(cbh < 3.0, 0.02,
                     0.96729352 + cbh * (-0.70034167 + cbh * (0.162179896
                     + cbh * (-1.2569798e-2 + cbh * (4.2772e-4
                                                     - cbh * 5.44e-6)))))
    rcbh = jnp.where(cbh > 25.0, 2.4, rcbh)
    pefcbh = jnp.minimum(1.0 / (1.0 + rcbh), 0.9)
    peff = 0.5 * (pef + pefcbh)
    peff2 = peff

    # ================= downdraft (":1152-1410") ==========================
    kstart = jnp.minimum(jnp.maximum(kpbl, klcl), nz - 3)
    dd_rng = (kidx >= kstart + 1) & (kidx <= ltop - 1)
    thtes_m = jnp.where(dd_rng, thtes, 1e10)
    # last occurrence of the running minimum (":1166-1171")
    kmin = (nz - 1) - jnp.argmin(jnp.flip(thtes_m))
    lfs = jnp.clip(kmin, 1, nz - 2)

    thetee_lfs = jnp.where(ratio2[lfs] > 0.0,
                           _envirtht(p0[lfs], t0[lfs], q0[lfs], f8(0.0),
                                     c["rl"]),
                           thetee[lfs])
    eqfrc_lfs = jnp.clip(_sd(thtes[lfs] - theteu[lfs],
                             thetee_lfs - theteu[lfs]), 0.0, 1.0)
    dtmltd = jnp.where(ml > 0, 0.5 * (qua[klcl] - qua[ltop]) * RLF / CP,
                       0.0)
    tz_lfs = t0[lfs] - dtmltd
    es_lfs = _esl(tz_lfs)
    qs_lfs = EP2 * es_lfs / (p0[lfs] - es_lfs)
    qd_lfs = eqfrc_lfs * q0[lfs] + (1.0 - eqfrc_lfs) * qua[lfs]
    thtad_lfs = tz_lfs * (P00 / p0[lfs]) ** (0.2854 * (1.0 - 0.28 * qd_lfs))
    theted_lfs = jnp.where(
        qd_lfs >= qs_lfs,
        thtad_lfs * jnp.exp((3374.6525 / tz_lfs - 2.5403) * qs_lfs
                            * (1.0 + 0.81 * qs_lfs)),
        _envirtht(p0[lfs], tz_lfs, qd_lfs, f8(0.0), c["rl"]))

    # LDB: highest level below LFS where the downdraft is negatively
    # buoyant (":1197-1212")
    cand = (kidx < lfs) & ((theted_lfs > thtes) | (kidx == 0))
    ldb = jnp.maximum(jnp.max(jnp.where(cand, kidx, 0)), 0)
    no_dd_geom = (ldb == lfs - 1) | ((p0[ldb] - p0[lfs]) < 50e2)
    ldt = ldb
    dpdd = dp[ldb]

    # first-guess downdraft mass flux (":1232-1262")
    tvd_lfs = t0[lfs] * (1.0 + 0.608 * qes[lfs])
    rdd = p0[lfs] / (R * tvd_lfs)
    dmf0 = -(1.0 - peff) * AU0 * rdd

    dmf = jnp.zeros(nz, f8).at[lfs].set(dmf0)
    der = jnp.zeros(nz, f8).at[lfs].set(eqfrc_lfs * dmf0)
    ddr = jnp.zeros(nz, f8)
    theted = jnp.zeros(nz, f8).at[lfs].set(theted_lfs)
    qd = jnp.zeros(nz, f8).at[lfs].set(qd_lfs)

    def dd_body(i, s):
        nd = lfs - 1 - i
        run = nd >= ldb
        dmf_a, der_a, ddr_a, theted_a, qd_a = s
        nd1 = nd + 1
        is_det = nd <= ldt
        der_n = jnp.where(is_det, 0.0, dmf0 * 0.03 * dp[nd] / RAD_KF)
        ddr_n = jnp.where(is_det, -dmf_a[ldt + 1] * dp[nd] / dpdd, 0.0)
        dmf_n = dmf_a[nd1] + ddr_n + der_n
        thetee_nd = jnp.where(ratio2[nd] > 0.0,
                              _envirtht(p0[nd], t0[nd], q0[nd], f8(0.0),
                                        c["rl"]), thetee[nd])
        theted_n = jnp.where(is_det, theted_a[nd1],
                             (theted_a[nd1] * dmf_a[nd1]
                              + thetee_nd * der_n) / dmf_n)
        qd_n = jnp.where(is_det, qd_a[nd1],
                         (qd_a[nd1] * dmf_a[nd1] + q0[nd] * der_n)
                         / dmf_n)
        dmf_a = jnp.where(run, dmf_a.at[nd].set(dmf_n), dmf_a)
        der_a = jnp.where(run, der_a.at[nd].set(der_n), der_a)
        ddr_a = jnp.where(run, ddr_a.at[nd].set(ddr_n), ddr_a)
        theted_a = jnp.where(run, theted_a.at[nd].set(theted_n), theted_a)
        qd_a = jnp.where(run, qd_a.at[nd].set(qd_n), qd_a)
        return (dmf_a, der_a, ddr_a, theted_a, qd_a)

    dmf, der, ddr, theted, qd = jax.lax.fori_loop(
        0, nz, dd_body, (dmf, der, ddr, theted, qd))

    # evaporation in the (single) detrainment layer (":1266-1292")
    tz_ldb, qs_e = _wetbulb(p0[ldb], theted[ldt], t0[ldb], f8(0.0),
                            f8(2.5e6), 0.05)
    dssdt = (CLIQK - BLIQ * DLIQ) / ((tz_ldb - DLIQ) * (tz_ldb - DLIQ))
    rl_e = XLV0 - XLV1 * tz_ldb
    dtmp = rl_e * qs_e * (1.0 - RHBC) / (CP + rl_e * RHBC * qs_e * dssdt)
    t1rh = tz_ldb + dtmp
    es_rh = RHBC * _esl(t1rh)
    qsrh = EP2 * es_rh / (p0[ldb] - es_rh)
    dry = qsrh < qd[ldb]
    qsrh = jnp.where(dry, qd[ldb], qsrh)
    t1rh = jnp.where(dry, tz_ldb, t1rh)
    tder = (qsrh - qd[ldb]) * ddr[ldb]
    qd = qd.at[ldb].set(qsrh)
    tz_arr = jnp.zeros(nz, f8).at[ldb].set(t1rh)
    thtad = jnp.zeros(nz, f8).at[lfs].set(thtad_lfs)
    thtad = thtad.at[ldb].set(
        t1rh * (P00 / p0[ldb]) ** (0.2854 * (1.0 - 0.28 * qsrh)))

    # precipitation-efficiency consistency (":1294-1345")
    ppr = jnp.sum(jnp.where((kidx >= klcl) & (kidx <= lfs),
                            pptliq + pptice, 0.0))
    pptflx_dd = peff * usr
    rced = trppt - pptflx_dd
    devdmf = _sd(tder, dmf0)
    dpptdf = jnp.where(lfs >= klcl,
                       (1.0 - peff) * ppr * (1.0 - eqfrc_lfs)
                       * _sd(1.0, umf[lfs]), 0.0)
    cndtnf = (qliq[lfs] + qice[lfs]) * (1.0 - eqfrc_lfs)
    dmflfs = rced * _sd(1.0, devdmf + dpptdf + cndtnf)

    no_dd = no_dd_geom | (tder < 1.0) | (dmflfs > 0.0)

    updinc_raw = jnp.where(lfs >= klcl,
                           (umf[lfs] - (1.0 - eqfrc_lfs) * dmflfs)
                           * _sd(1.0, umf[lfs]), 1.0)
    cap = updinc_raw > 1.5
    updinc = jnp.where(cap, 1.5, updinc_raw)
    dmflfs2 = umf[lfs] * (updinc - 1.0) * _sd(1.0, eqfrc_lfs - 1.0)
    rced2 = dmflfs2 * (devdmf + dpptdf + cndtnf)
    pptflx_dd = jnp.where(cap, pptflx_dd + (rced - rced2), pptflx_dd)
    peff2 = jnp.where(cap, pptflx_dd / jnp.maximum(usr, 1e-10), peff2)
    dmflfs = jnp.where(cap, dmflfs2, dmflfs)
    ddinc = _sd(dmflfs, dmf0)

    dd_msk = (kidx >= ldb) & (kidx <= lfs)
    dmf = jnp.where(no_dd, 0.0, jnp.where(dd_msk, dmf * ddinc, 0.0))
    der = jnp.where(no_dd, 0.0, jnp.where(dd_msk, der * ddinc, 0.0))
    ddr = jnp.where(no_dd, 0.0, jnp.where(dd_msk, ddr * ddinc, 0.0))
    thtad = jnp.where(no_dd, 0.0, thtad)
    qd = jnp.where(no_dd, 0.0, qd)
    tz_arr = jnp.where(no_dd, 0.0, tz_arr)

    cpr = jnp.where(no_dd, trppt, trppt + ppr * (updinc - 1.0))
    pptflx = jnp.where(no_dd, trppt,
                       pptflx_dd + peff * ppr * (updinc - 1.0))
    peff = jnp.where(no_dd, peff, peff2)
    tder = jnp.where(no_dd, 0.0, tder * ddinc)
    updinc = jnp.where(no_dd, 1.0, updinc)
    ldb_eff = jnp.where(no_dd, lfs, ldb)

    up_msk = (kidx >= lc) & (kidx <= lfs) & ~no_dd
    umf = jnp.where(up_msk, umf * updinc, umf)
    udr = jnp.where(up_msk, udr * updinc, udr)
    uer = jnp.where(up_msk, uer * updinc, uer)
    pptliq = jnp.where(up_msk, pptliq * updinc, pptliq)
    pptice = jnp.where(up_msk, pptice * updinc, pptice)
    detlq = jnp.where(up_msk, detlq * updinc, detlq)
    detic = jnp.where(up_msk, detic * updinc, detic)

    # ================= CAPE-removal closure (":1412-1740") ===============
    lmax = jnp.maximum(klcl, lfs)
    inflow = uer - der
    aincm1 = jnp.where((kidx >= lc) & (kidx <= lmax) & (inflow > 0.0),
                       ems / jnp.maximum(inflow * timec, 1e-10), 1000.0)
    aincmx = jnp.minimum(jnp.min(aincm1), 1000.0)
    ainc0 = jnp.minimum(1.0, aincmx)

    tder2, pptfl2 = tder, pptflx
    base = dict(umf=umf, dmf=dmf, detlq=detlq, detic=detic, udr=udr,
                uer=uer, der=der, ddr=ddr)
    # pre-scale when the available-mass limit binds (":1470-1476")
    pre_fac = jnp.where(aincmx < 1.0, ainc0, 1.0)
    scaled0 = {k: v * pre_fac for k, v in base.items()}
    abort0 = ainc0 < 0.05

    cu_msk = kidx <= ltop
    cu_mskf = cu_msk.astype(f8)

    def _substeps(sub_fns, init, nstep):
        """Run the upstream/forward-in-time advection substeps
        (":1496-1540"); nstep is dynamic, capped at 200."""
        nmax = jnp.minimum(nstep, 200)

        def body(cc):
            n, state = cc
            return (n + 1, tuple(f(state[i]) for i, f in
                                 enumerate(sub_fns)))

        _, out = jax.lax.while_loop(lambda cc: cc[0] < nmax, body,
                                    (jnp.int32(0), init))
        return out

    def _adv_sub(sources, dtime, fxm):
        def sub(pa):
            pa_dn = jnp.concatenate([pa[:1], pa[:-1]])
            donor = jnp.where(fxm <= 0.0, pa_dn, pa)
            fxbot = jnp.where(kidx >= 1, -fxm * donor, 0.0)
            fxtop = jnp.concatenate([-fxbot[1:], jnp.zeros(1, f8)])
            upd = (fxbot + sources + fxtop) * dtime * emsd
            return jnp.where(cu_msk, pa + upd, pa)
        return sub

    def closure_body(cl):
        ncount = cl["ncount"] + 1
        s = cl["s"]
        domgdp = -(s["uer"] - s["der"] - s["udr"] - s["ddr"]) * emsd
        omg = jnp.concatenate([
            jnp.zeros(1, f8),
            -jnp.cumsum((dp * domgdp)[:-1])]) * cu_mskf
        dtt_lv = 0.75 * jnp.concatenate([jnp.full(1, 1e10, f8), dp[:-1]]) \
            / (jnp.abs(omg) + 1e-10)
        dtt = jnp.minimum(timec, jnp.min(jnp.where(cu_msk & (kidx >= 1),
                                                   dtt_lv, 1e10)))
        nstep = jnp.round(timec / dtt + 1.0).astype(jnp.int32)
        dtime = timec / nstep.astype(f8)
        fxm = omg * dxsq / G

        th_src = (s["udr"] * thtau + s["ddr"] * thtad
                  - (s["uer"] - s["der"]) * thta0)
        q_src = (s["udr"] * qdt + s["ddr"] * qd
                 - (s["uer"] - s["der"]) * q0)
        thpa, qpa = _substeps((_adv_sub(th_src, dtime, fxm),
                               _adv_sub(q_src, dtime, fxm)),
                              (thta0, q0), nstep)

        # borrow moisture to fix negative qv (":1543-1567")
        def borrow(nk, qg_):
            bad = (qg_[nk] < 0.0) & (nk >= 1) & cu_msk[nk]
            nk1 = jnp.where(nk == ltop, klcl, jnp.minimum(nk + 1, nz - 1))
            tma = qg_[nk1] * ems[nk1]
            tmb = qg_[nk - 1] * ems[nk - 1]
            tmm = (qg_[nk] - 1e-9) * ems[nk]
            bcoeff = -tmm * _sd(1.0, (tma * tma) * _sd(1.0, tmb) + tmb)
            acoeff = bcoeff * tma * _sd(1.0, tmb)
            tmb = tmb * (1.0 - bcoeff)
            tma = tma * (1.0 - acoeff)
            qg_n = qg_.at[nk].set(1e-9).at[nk1].set(tma * emsd[nk1]) \
                .at[nk - 1].set(tmb * emsd[nk - 1])
            return jnp.where(bad, qg_n, qg_)

        qpa = jax.lax.fori_loop(0, nz, borrow, qpa)

        topomg = (s["udr"][ltop] - s["uer"][ltop]) * dp[ltop] * emsd[ltop]
        bad_mass = jnp.abs(topomg - omg[ltop]) > 1e-3

        exn_g = (P00 / p0) ** (0.2854 * (1.0 - 0.28 * qpa))
        tg = thpa / exn_g

        # new mixed parcel + ABEG (":1594-1680")
        msk = (kidx >= lc) & (kidx <= kpbl)
        mw = jnp.where(msk, dp, 0.0)
        rocpq_g = 0.2854 * (1.0 - 0.28 * qpa)
        thmix_g = jnp.sum(mw * tg * (P00 / p0) ** rocpq_g) / dpthmx
        qmix_g = jnp.sum(mw * qpa) / dpthmx
        pmix_g = jnp.sum(mw * p0) / dpthmx
        rocpq2 = 0.2854 * (1.0 - 0.28 * qmix_g)
        tmix_g = thmix_g * (pmix_g / P00) ** rocpq2
        es_g = _esl(tmix_g)
        qs_g = EP2 * es_g / (pmix_g - es_g)
        supsat = qmix_g > qs_g
        rl_g = XLV0 - XLV1 * tmix_g
        cpm_g = CP * (1.0 + 0.887 * qmix_g)
        dssdt_g = qs_g * (CLIQK - BLIQ * DLIQ) / ((tmix_g - DLIQ) ** 2)
        dq_g = (qmix_g - qs_g) / (1.0 + rl_g * dssdt_g / cpm_g)
        tmix_s = tmix_g + rl_g / CP * dq_g
        qmix_s = qmix_g - dq_g
        emix_g = jnp.maximum(qmix_g, 0.0) * pmix_g \
            / (EP2 + jnp.maximum(qmix_g, 0.0))
        tlog_g = jnp.log(jnp.maximum(emix_g, 1e-10) / ALIQ)
        tdpt_g = (CLIQK - DLIQ * tlog_g) / (BLIQ - tlog_g)
        tlcl_u = tdpt_g - (0.212 + 1.571e-3 * (tdpt_g - T00)
                           - 4.36e-4 * (tmix_g - T00)) * (tmix_g - tdpt_g)
        tlcl_g = jnp.where(supsat, tmix_s, jnp.minimum(tlcl_u, tmix_g))
        qmix_f = jnp.where(supsat, qmix_s, jnp.maximum(qmix_g, 0.0))
        tmix_f = jnp.where(supsat, tmix_s, tmix_g)
        thmix_f = jnp.where(supsat,
                            tmix_s * (P00 / pmix_g)
                            ** (0.2854 * (1.0 - 0.28 * qmix_s)), thmix_g)
        plcl_g = jnp.where(supsat, pmix_g,
                           P00 * (tlcl_g / thmix_f)
                           ** (1.0 / (0.2854 * (1.0 - 0.28 * qmix_f))))
        hit_g = (kidx >= lc) & (plcl_g >= p0)
        klcl_g = jnp.clip(jnp.min(jnp.where(hit_g, kidx, nz - 1)), 1,
                          nz - 1)
        k_g = klcl_g - 1
        dlp_g = jnp.log(plcl_g / p0[k_g]) \
            / jnp.log(p0[klcl_g] / p0[k_g])
        tenv_g = tg[k_g] + (tg[klcl_g] - tg[k_g]) * dlp_g
        qenv_g = qpa[k_g] + (qpa[klcl_g] - qpa[k_g]) * dlp_g
        tven_g = tenv_g * (1.0 + 0.608 * qenv_g)
        zlcl_g = z0[k_g] + (z0[klcl_g] - z0[k_g]) * dlp_g
        tvavg_g = 0.5 * (tven_g + tg[klcl_g] * (1.0 + 0.608 * qpa[klcl_g]))
        plcl_g2 = p0[klcl_g] * jnp.exp(G / (R * tvavg_g)
                                       * (z0[klcl_g] - zlcl_g))
        theteu_g = _theta_e(tmix_f, pmix_g, qmix_f, tlcl_g)
        es_eg = _esl(tenv_g)
        qese_g = EP2 * es_eg / (plcl_g2 - es_eg)
        thtesg_k = _theta_e(tenv_g, plcl_g2, qese_g, tenv_g)

        es_lv = _esl(tg)
        qese_lv = EP2 * es_lv / (p0 - es_lv)
        thtesg = _theta_e(tg, p0, qese_lv, tg)
        thtesg = thtesg.at[k_g].set(thtesg_k)
        thtesg_dn = jnp.concatenate([thtesg[:1], thtesg[:-1]])
        dzz_g = jnp.where(kidx == klcl_g, z0[klcl_g] - zlcl_g,
                          jnp.concatenate([dza[:1], dza[:-1]]))
        be_g = ((2.0 * theteu_g) / (thtesg + thtesg_dn) - 1.0) * dzz_g
        abeg = jnp.sum(jnp.where((kidx > k_g) & (kidx <= ltop)
                                 & (be_g > 0.0), be_g * G, 0.0))

        done_noitr = (cl["noitr"] == 1) | bad_mass
        dabe = jnp.maximum(abe - abeg, 0.1 * abe)
        fabe = abeg / (abe + 1e-8)
        abort_fabe = fabe > 1.0

        dfda = _sd(fabe - cl["fabeold"], cl["ainc"] - cl["aincold"])
        revert = (ncount != 1) & (dfda > 0.0) & ~done_noitr & ~abort_fabe
        ainc_r = jnp.where(revert, cl["aincold"], cl["ainc"])

        conv1 = (ainc_r / aincmx > 0.999) & (fabe > 1.05 - STAB)
        conv2 = (fabe <= 1.05 - STAB) & (fabe >= 0.95 - STAB)
        conv3 = ncount > 10
        done = done_noitr | abort_fabe | ((conv1 | conv2 | conv3)
                                          & ~revert)

        ainc_new = jnp.where(fabe == 0.0, ainc_r * 0.5,
                             ainc_r * STAB * abe / (dabe + 1e-8))
        ainc_new = jnp.where(revert, ainc_r, ainc_new)
        ainc_new = jnp.minimum(aincmx, ainc_new)
        abort_small = (ainc_new < 0.05) & ~done
        ainc_next = jnp.where(done, cl["ainc"], ainc_new)

        s_next = {k: base[k] * ainc_next for k in base}
        out = dict(cl)
        out.update(ncount=ncount, done=done | abort_small,
                   abort=cl["abort"] | abort_fabe | abort_small
                   | bad_mass,
                   noitr=jnp.where(revert, 1, cl["noitr"]),
                   ainc=ainc_next,
                   aincold=jnp.where(done, cl["aincold"], cl["ainc"]),
                   fabeold=jnp.where(done, cl["fabeold"], fabe),
                   s=jax.tree_util.tree_map(
                       lambda a, b: jnp.where(done, a, b), s, s_next),
                   tg=tg, qg=qpa, omg=omg, fxm=fxm, nstep=nstep,
                   dtime=dtime)
        return out

    cl0 = dict(ncount=jnp.int32(0), done=abort0,
               abort=abort0, noitr=jnp.int32(0),
               ainc=ainc0, aincold=ainc0, fabeold=f8(1.0),
               s=scaled0, tg=t0, qg=q0, omg=zeros, fxm=zeros,
               nstep=jnp.int32(1), dtime=timec)
    cl = jax.lax.while_loop(lambda cl: (~cl["done"]) & (cl["ncount"] < 14),
                            closure_body, cl0)

    ainc = cl["ainc"]
    sfin = cl["s"]
    tg, qg = cl["tg"], cl["qg"]
    pptflx_f = pptfl2 * ainc

    # --- hydrometeor feedback advection (":1742-1810") -------------------
    frc2 = pptflx_f * _sd(1.0, cpr * ainc)
    del frc2  # only scales the FBFRC=0 rain feedback (":1752-1756")
    fxm_f, nstep_f, dtime_f = cl["fxm"], cl["nstep"], cl["dtime"]

    qlg, qig, qrg, qsg = _substeps(
        (_adv_sub(sfin["detlq"], dtime_f, fxm_f),
         _adv_sub(sfin["detic"], dtime_f, fxm_f),
         _adv_sub(qlqout * sfin["udr"], dtime_f, fxm_f),
         _adv_sub(qicout * sfin["udr"], dtime_f, fxm_f)),
        (zeros, zeros, zeros, zeros), nstep_f)

    # --- feedback tendencies (qi_flag & qs_flag true, ":1878-1944") -----
    timec_s = jnp.maximum(timec, 1.0)
    dqcdt = qlg / timec_s
    dqidt = qig / timec_s
    dqrdt = qrg / timec_s
    dqsdt = qsg / timec_s
    dtdt = (tg - t0) / timec_s
    dqdt = (qg - q0) / timec_s

    nic_f = jnp.where(tadvec < timec, jnp.round(tadvec / dt), nic)
    nca_new = nic_f * dt
    pratec = pptflx_f * (1.0 - FBFRC) / dxsq

    # where-select (not multiply): non-triggered columns may carry NaN
    # garbage from failed trigger-search iterations
    ok = triggered & ~cl["abort"]

    def m(x):
        return jnp.where(ok, jnp.nan_to_num(x, nan=0.0, posinf=0.0,
                                            neginf=0.0), 0.0)

    return dict(dtdt=m(dtdt), dqdt=m(dqdt), dqcdt=m(dqcdt),
                dqrdt=m(dqrdt), dqidt=m(dqidt), dqsdt=m(dqsdt),
                pratec=m(pratec), nca=m(nca_new), triggered=ok)


def _kf_columns(u, v, t, qv, p, rho, dz, w0avg, dt, dx):
    """vmap _kf_column over every (y, x) column."""
    nz, ny, nx = t.shape

    def flat(a):
        return a.reshape(nz, ny * nx).T        # (ncol, nz)

    cols = jax.vmap(_kf_column, in_axes=(0,) * 8 + (None, None))
    out = cols(flat(u), flat(v), flat(t), flat(qv), flat(p), flat(rho),
               flat(dz), flat(w0avg), dt, dx)

    def unflat(a):
        if a.ndim == 2:
            return a.T.reshape(nz, ny, nx)
        return a.reshape(ny, nx)

    return {k: unflat(v_) for k, v_ in out.items()}


def kfcps(u, v, th, qv, p, rho, dz, w_real, exner, dt, dx,
          w0avg, nca, pratec, tend_th, tend_qv, tend_qc, tend_qr,
          tend_qi, tend_qs):
    """KFCPS driver step (cu_kf.f90:17-305): update the W0AVG running
    mean, re-trigger columns whose NCA countdown expired, and return the
    (persistent) convective tendencies plus this step's convective rain.

    Columns with NCA > dt/2 keep their stored tendencies untouched
    (cu_kf.f90:224-230); re-checked columns get fresh tendencies (zero if
    convection does not trigger). All 3D args (z, y, x); nca/pratec are
    (y, x) state. Returns (tend_th, tend_qv, tend_qc, tend_qr, tend_qi,
    tend_qs, raincv, w0avg, nca, pratec); raincv [mm] = dt*pratec.
    """
    t = th * exner
    # W0AVG running mean with TST = 2*STEPCU = 2 (cu_kf.f90:155-207)
    w_below = jnp.concatenate([jnp.zeros_like(w_real[:1]), w_real[:-1]],
                              axis=0)
    w0 = 0.5 * (w_below + w_real)
    w0avg = (w0avg + w0) / 2.0

    check = nca <= 0.5 * dt
    out = _kf_columns(u, v, t, qv, p, rho, dz, w0avg, dt, dx)
    c3 = check[None]
    # RTHCUTEN = DTDT/exner (cu_kf.f90:268-271)
    tend_th = jnp.where(c3, out["dtdt"] / exner, tend_th)
    tend_qv = jnp.where(c3, out["dqdt"], tend_qv)
    tend_qc = jnp.where(c3, out["dqcdt"], tend_qc)
    tend_qr = jnp.where(c3, out["dqrdt"], tend_qr)
    tend_qi = jnp.where(c3, out["dqidt"], tend_qi)
    tend_qs = jnp.where(c3, out["dqsdt"], tend_qs)
    pratec = jnp.where(check, out["pratec"], pratec)
    nca = jnp.where(check, out["nca"], nca)

    raincv = dt * pratec
    nca = nca - dt
    return (tend_th, tend_qv, tend_qc, tend_qr, tend_qi, tend_qs,
            raincv, w0avg, nca, pratec)
