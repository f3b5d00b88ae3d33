"""NSAS (New Simplified Arakawa-Schubert) cumulus convection.

JAX re-implementation of /root/reference/src/physics/cu_nsas.f90: the
NCEP SAS deep-convection scheme (nsas2d, lines 313-2081; Han & Pan 2011)
plus the companion non-precipitating shallow scheme (nscv2d, lines
2193-3288; Han & Pan 2010), vectorized over (ny, nx) columns with
lax.fori_loop level recurrences. One cloud type with entraining updraft
(Bechtold ensemble-mimicking entrainment), saturated downdraft, cloud
work function closure against climatological critical values (deep), and
a PBL-buoyancy-flux mass closure after Grant (2001) (shallow).

NSAS works bottom-up (k=0 at the surface) like the model layout, so no
vertical flipping is required. Pressures are in mb internally (the
scheme's cb*10 convention); all humidities are mixing ratios.

ICAR applies only the theta/qv/qc/qi tendencies and precipitation
(momentum tendencies are computed but their application is disabled in
the reference driver, cu_driver.f90:502-508), so u/v updates are
omitted here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.indexing import take_level
import numpy as np

# physical constants as passed by ICAR's cu_driver (mod_wrf_constants)
CP = 1004.6
CLIQ = 4190.0
CPV = 1846.0
G = 9.81
HVAP = 2.5e6
RD = 287.0
RV = 461.6
FV = RV / RD - 1.0
CICE = 2106.0
XLS = 2.85e6
PSAT = 610.78
T0C = 273.15
QMIN = 1e-30

EL2ORC = HVAP * HVAP / (RV * CP)
EPS = RD / RV
FACT1 = (CPV - CLIQ) / RV
FACT2 = HVAP / RV - FACT1 * T0C

# deep-scheme tunables (cu_nsas.f90:410-430)
PDETRN = 200.0
C0, C1 = 0.002, 0.002
XLAMDD, XLAMDE = 1.0e-4, 1.0e-4
CLAM, CXLAMU = 0.1, 1.0e-4
AAFAC = 0.1
DTHK = 25.0
CINCRMAX, CINCRMIN = 180.0, 120.0
MBDT = 10.0
EDTMAXL, EDTMAXS = 0.3, 0.3
EVFACTS, EVFACTL = 0.3, 0.3
ALPHAL, ALPHAS = 0.5, 0.5
BETAL, BETAS = 0.05, 0.05
TF, TCR = 233.16, 263.16
TCRF = 1.0 / (TCR - TF)
PGCON = 0.55

PCRIT = np.array([850., 800., 750., 700., 650., 600., 550., 500., 450.,
                  400., 350., 300., 250., 200., 150.])
ACRITT = np.array([.0633, .0445, .0553, .0664, .075, .1082, .1521,
                   .2216, .3151, .3677, .41, .5255, .7663, 1.1686,
                   1.6851])
ACRIT = ACRITT * (975.0 - PCRIT)


def fpvs_mb(t):
    """Saturation vapor pressure [mb], mixed phase below the triple
    point (inlined fpvs as in wrf_constants / mp_wsm3)."""
    ttp = T0C + 0.01
    dldt = CPV - CLIQ
    xa = -dldt / RV
    xb = xa + HVAP / (RV * ttp)
    dldti = CPV - CICE
    xai = -dldti / RV
    xbi = xai + XLS / (RV * ttp)
    tr = ttp / t
    es_w = PSAT * tr ** xa * jnp.exp(xb * (1.0 - tr))
    es_i = PSAT * tr ** xai * jnp.exp(xbi * (1.0 - tr))
    return 0.01 * jnp.where(t < ttp, es_i, es_w)


def _qes(t, p_mb):
    qs = EPS * fpvs_mb(t) / (p_mb + (EPS - 1.0) * fpvs_mb(t))
    return jnp.maximum(qs, QMIN)


def _lev(arr, kidx):
    return take_level(arr, kidx)


def _first_above(cond, k0, default, lo=1):
    """Lowest k in [lo, KLEV) with cond[k] & (k-relation handled by
    caller via cond); returns default where none."""
    KLEV = cond.shape[0]
    karr = jnp.arange(KLEV)[:, None, None]
    valid = cond & (karr >= lo)
    any_hit = jnp.any(valid, axis=0)
    first = jnp.argmax(valid, axis=0).astype(jnp.int32)
    return jnp.where(any_hit, first, default)


def _row(a, i):
    return jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)


def _setrow(a, i, v):
    return jax.lax.dynamic_update_index_in_dim(a, v, i, 0)


def _half_level_env(to, qo, zl, p, kmax_mask_dummy, KLEV):
    """Shift environment to half levels (the common to/qo/heo half-level
    construction, cu_nsas.f90:733-780 / 2560-2600). Returns
    (to, qo, qeso, heo, heso) with levels 0..KLEV-2 at interfaces."""
    tkp = jnp.concatenate([to[1:], to[-1:]], 0)
    qkp = jnp.concatenate([qo[1:], qo[-1:]], 0)
    pkp = jnp.concatenate([p[1:], p[-1:]], 0)
    zkp = jnp.concatenate([zl[1:], zl[-1:]], 0)
    qeskp = _qes(tkp, pkp)
    dz = 0.5 * (zkp - zl)
    dp = 0.5 * (pkp - p)
    es = fpvs_mb(tkp)
    pprime = pkp + (EPS - 1.0) * es
    qs = EPS * es / pprime
    dqsdp = -qs / pprime
    desdt = es * (FACT1 / tkp + FACT2 / tkp ** 2)
    dqsdt = qs * pkp * desdt / (es * pprime)
    gamma = EL2ORC * qeskp / tkp ** 2
    dt = (G * dz + HVAP * dqsdp * dp) / (CP * (1.0 + gamma))
    dq = dqsdt * dt + dqsdp * dp
    to_h = tkp + dt
    qo_h = jnp.maximum(qkp + dq, 1e-10)
    po = 0.5 * (p + pkp)
    qeso_h = _qes(to_h, po)
    zmid = 0.5 * (zl + zkp)
    heo_h = G * zmid + CP * to_h + HVAP * qo_h
    heso_h = G * zmid + CP * to_h + HVAP * qeso_h
    # top level keeps full-level values
    last = KLEV - 1
    to_h = to_h.at[last].set(to[last])
    qo_h = qo_h.at[last].set(qo[last])
    qeso_h = qeso_h.at[last].set(_qes(to[last], p[last]))
    heo_h = heo_h.at[last].set(G * zl[last] + CP * to[last]
                               + HVAP * qo[last])
    heso_h = heso_h.at[last].set(G * zl[last] + CP * to[last]
                                 + HVAP * qeso_h[last])
    return to_h, qo_h, qeso_h, heo_h, heso_h, po


def _updraft_recur(kb, lo_arr, mix_coef, xlamud, zi, start_val, env_mid,
                   active):
    """Generic upward in-cloud mixing recurrence
    f(k) = ((1-tem1) f(k-1) + tem*env_mid(k)) / (1+tem-tem1)
    from level kb upward (cu_nsas.f90:915-935)."""
    KLEV = zi.shape[0] - 1
    karr = jnp.arange(KLEV)[:, None, None]
    init = jnp.where((karr == kb[None]), start_val[None],
                     jnp.zeros_like(env_mid))

    def body(k, f):
        dz = zi[k + 1] - zi[k]
        tem = 0.5 * (mix_coef[k] + mix_coef[k - 1]) * dz
        tem1 = 0.5 * xlamud * dz
        factor = 1.0 + tem - tem1
        val = ((1.0 - tem1) * _row(f, k - 1) + tem * env_mid[k]) / factor
        use = active & (k > kb)
        return _setrow(f, k, jnp.where(use, val, _row(f, k)))

    return jax.lax.fori_loop(1, KLEV - 1, body, init)


def nsas_deep(delt, dx, del_, prsl_mb, prsi_mb, zl, ncloud, qc2, qi2,
              q1, t1, slimsk, dot, u1, v1, dx_factor_nsas):
    """Deep SAS (nsas2d). All (KLEV, ny, nx) bottom-up; prs* in mb/10
    handled by caller passing mb. Returns (t1, q1, qc2, qi2, rain_m,
    kbot, ktop, icps)."""
    KLEV = t1.shape[0]
    shape2 = t1.shape[1:]
    karr = jnp.arange(KLEV)[:, None, None]
    dt2 = delt
    dtmin = jnp.maximum(dt2, 1200.0)
    dtmax = jnp.maximum(dt2, 3600.0)
    zero2 = jnp.zeros(shape2, t1.dtype)
    zero3 = jnp.zeros_like(t1)

    if dx_factor_nsas == 1:
        dxf = 250.0 / dx
        w1l = w4l = -0.1 * dxf
        w2l = w3l = -dxf
        w1s, w2s, w3s, w4s = w1l, w2l, w3l, w4l
    else:
        w1l, w2l, w3l, w4l = -8e-3, -4e-2, -5e-3, -5e-4
        w1s, w2s, w3s, w4s = -2e-4, -2e-3, -1e-3, -2e-5
    land = slimsk == 1.0
    w1 = jnp.where(land, w1l, w1s)
    w2 = jnp.where(land, w2l, w2s)
    w3 = jnp.where(land, w3l, w3s)
    w4 = jnp.where(land, w4l, w4s)

    p = prsl_mb
    psfc0 = prsi_mb[0]
    # search-depth caps (cu_nsas.f90:690-700); per-column highest level
    # satisfying the pressure fraction
    kbmax = jnp.minimum(
        jnp.sum((p > psfc0[None] * 0.45).astype(jnp.int32), 0),
        KLEV - 1).astype(jnp.int32)
    kbm = jnp.minimum(
        jnp.sum((p > psfc0[None] * 0.70).astype(jnp.int32), 0),
        KLEV - 1).astype(jnp.int32)
    kmaxc = jnp.minimum(
        jnp.sum((p > psfc0[None] * 0.04).astype(jnp.int32), 0),
        KLEV - 1).astype(jnp.int32)

    to = t1
    qo = jnp.maximum(q1, 1e-10)
    uo = u1
    vo = v1
    qeso = _qes(to, p)
    heo = G * zl + CP * to + HVAP * qo
    heso = G * zl + CP * to + HVAP * qeso

    # updraft starting level: max moist static energy below kbm
    # (full-level heo, cu_nsas.f90:698-710)
    hmasked = jnp.where(karr <= kbm[None], heo, -jnp.inf)
    kb = jnp.argmax(hmasked, axis=0).astype(jnp.int32)

    # half-level environment; hkbo/qkbo read from the shifted profiles
    # (cu_nsas.f90:712-750)
    to, qo, qeso, heo, heso, po = _half_level_env(to, qo, zl, p, None,
                                                  KLEV)
    frh = jnp.maximum(1.0 - qo / qeso, 0.0)
    hkbo = _lev(heo, kb)
    qkbo = _lev(qo, kb)

    cnvflg = jnp.ones(shape2, bool)
    # level of free convection
    lfc_cond = (karr > kb[None]) & (hkbo[None] > heso) \
        & (karr <= kbmax[None])
    kbcon = _first_above(lfc_cond, None, KLEV - 1)
    cnvflg = cnvflg & (kbcon < KLEV - 1)

    # critical convective inhibition vs cloud-base omega
    pdot = 10.0 * _lev(dot, kbcon)
    tem = jnp.where(pdot <= w4, (pdot - w4) / (w3 - w4),
                    jnp.where(pdot >= -w4, -(pdot + w4) / (w4 - w3),
                              0.0))
    tem = 1.0 - jnp.clip(tem, -1.0, 1.0)
    cincr = CINCRMAX - tem * 0.5 * (CINCRMAX - CINCRMIN)
    pbcdif = -_lev(p, kbcon) + _lev(p, kb)
    cnvflg = cnvflg & (pbcdif <= cincr)

    # interface heights + entrainment profile
    zi = jnp.concatenate([zl[:1] * 0.0,
                          0.5 * (zl[:-1] + zl[1:]),
                          zl[-1:]], 0)           # (KLEV+1,...)
    xlamb = CLAM / zi[1:KLEV + 1]
    xlamb_b = _lev(xlamb, kbcon)
    xlamb = jnp.where(karr > kbcon[None], xlamb_b[None], xlamb)
    xlamud = xlamb_b
    fent1 = jnp.where(karr > kbcon[None],
                      (qeso / _lev(qeso, kbcon)[None]) ** 2, 1.0)
    fent2 = jnp.where(karr > kbcon[None],
                      (qeso / _lev(qeso, kbcon)[None]) ** 3, 1.0)
    xlamb = jnp.where(karr >= kbcon[None],
                      xlamb * fent1 + CXLAMU * frh * fent2, xlamb)

    # updraft normalized mass flux eta
    eta = jnp.ones_like(t1)

    def eta_dn(it, eta):
        k = KLEV - 2 - it
        dz = zi[k + 2] - zi[k + 1]
        ptem = 0.5 * (_row(xlamb, k) + _row(xlamb, k + 1)) - xlamud
        val = _row(eta, k + 1) / (1.0 + ptem * dz)
        use = cnvflg & (k < kbcon) & (k >= kb)
        return _setrow(eta, k, jnp.where(use, val, _row(eta, k)))

    eta = jax.lax.fori_loop(0, KLEV - 2, eta_dn, eta)

    def eta_up(k, eta):
        dz = zi[k + 1] - zi[k]
        ptem = 0.5 * (_row(xlamb, k) + _row(xlamb, k - 1)) - xlamud
        val = _row(eta, k - 1) * (1.0 + ptem * dz)
        use = cnvflg & (k > kbcon)
        return _setrow(eta, k, jnp.where(use, val, _row(eta, k)))

    eta = jax.lax.fori_loop(1, KLEV - 1, eta_up, eta)

    # updraft static energy + momentum (momentum tracked only for the
    # buoyancy chain; tendencies not applied)
    heo_mid = 0.5 * (heo + jnp.concatenate([heo[:1], heo[:-1]], 0))
    hcko = _updraft_recur(kb, None, xlamb, xlamud, zi, hkbo, heo_mid,
                          cnvflg)
    dbyo = hcko - heso

    # dry-layer inhibition
    kbcon1 = _first_above((karr >= kbcon[None]) & (dbyo > 0.0), None,
                          KLEV - 1)
    cnvflg = cnvflg & (kbcon1 < KLEV - 1)
    cnvflg = cnvflg & ((_lev(p, kbcon) - _lev(p, kbcon1)) <= DTHK)

    # first-guess cloud top: inversion above kbcon1
    ktcon = _first_above((karr > kbcon1[None]) & (dbyo < 0.0), None, 1)
    cnvflg = cnvflg & ((_lev(p, kbcon) - _lev(p, ktcon)) >= 150.0)

    # downdraft origination level (theta-e minimum)
    he_masked = jnp.where((karr > kbcon1[None]) & (karr <= kbmax[None]),
                          heo, jnp.inf)
    lmin = (jnp.argmin(he_masked, axis=0) + 1).astype(jnp.int32)
    jmin_ = jnp.clip(lmin, kbcon1 + 1, ktcon - 1)
    cnvflg = cnvflg & (jmin_ < ktcon)

    xmbmax = 1000.0 * _lev(del_, kbcon) / (G * dt2)

    # cloud moisture + condensation along ascent (fused recurrence)
    qo_mid = 0.5 * (qo + jnp.concatenate([qo[:1], qo[:-1]], 0))

    def qup_body(k, carry):
        qcko, qcirs, pwo, dellal, pwavo, aa1 = carry
        dz1 = zi[k + 1] - zi[k]
        gamma = EL2ORC * qeso[k] / to[k] ** 2
        qrch = qeso[k] + gamma * dbyo[k] / (HVAP * (1.0 + gamma))
        tem = 0.5 * (_row(xlamb, k) + _row(xlamb, k - 1)) * dz1
        tem1 = 0.5 * xlamud * dz1
        factor = 1.0 + tem - tem1
        qk = ((1.0 - tem1) * _row(qcko, k - 1)
              + tem * qo_mid[k]) / factor
        in_cloud = cnvflg & (k > kb) & (k < ktcon)
        qk = jnp.where(in_cloud, qk, _row(qcko, k))
        qci = _row(eta, k) * (qk - qrch)
        etah = 0.5 * (_row(eta, k) + _row(eta, k - 1))
        dp = 1000.0 * del_[k]
        wet = in_cloud & (qci > 0.0) & (k >= kbcon)
        use_c1 = wet & (ncloud > 0) & (k > jmin_)
        qlk = jnp.where(use_c1,
                        qci / (_row(eta, k) + etah * (C0 + C1) * dz1),
                        qci / (_row(eta, k) + etah * C0 * dz1))
        dlal = jnp.where(use_c1, etah * C1 * dz1 * qlk * G / dp, 0.0)
        aa1 = aa1 - jnp.where(wet, dz1 * G * qlk, 0.0)
        pw = jnp.where(wet, etah * C0 * dz1 * qlk, 0.0)
        qk = jnp.where(wet, qlk + qrch, qk)
        pwavo = pwavo + pw
        qcko = _setrow(qcko, k, qk)
        qcirs = _setrow(qcirs, k, jnp.where(in_cloud, qci, 0.0))
        pwo = _setrow(pwo, k, pw)
        dellal = _setrow(dellal, k, dlal)
        return (qcko, qcirs, pwo, dellal, pwavo, aa1)

    qcko0 = jnp.where((karr == kb[None]), qkbo[None], zero3)
    carry = (qcko0, zero3, zero3, zero3, zero2, zero2)
    qcko, qcirs, pwo, dellal, pwavo, aa1 = jax.lax.fori_loop(
        1, KLEV - 1, qup_body, carry)

    # cloud work function (buoyancy integral kbcon..ktcon)
    cwf_zone = (karr >= kbcon[None]) & (karr < ktcon[None])
    dz1_arr = jnp.concatenate([zl[1:] - zl[:-1], zl[-1:] * 0 + 1.0], 0)
    gamma_a = EL2ORC * qeso / to ** 2
    rfact = 1.0 + FV * CP * gamma_a * to / HVAP
    cwf_term = dz1_arr * (G / (CP * to)) * dbyo / (1.0 + gamma_a) \
        * rfact + dz1_arr * G * FV * jnp.maximum(0.0, qeso - qo)
    aa1 = aa1 + jnp.sum(jnp.where(cwf_zone & cnvflg[None], cwf_term,
                                  0.0), 0)
    cnvflg = cnvflg & (aa1 > 0.0)

    # convective overshooting: extend top while aafac*aa1 stays positive
    def ktcon1_scan(k, carry):
        aa2, kt1, flg = carry
        act = flg & (k >= ktcon) & (k < kmaxc)
        aa2 = aa2 + jnp.where(act, cwf_term[k], 0.0)
        hit = act & (aa2 < 0.0)
        kt1 = jnp.where(hit, k, kt1)
        flg = flg & ~hit
        return (aa2, kt1, flg)

    aa2_0 = AAFAC * aa1
    kt1_0 = jnp.full(shape2, KLEV - 2, jnp.int32)
    aa2, ktcon1, _ = jax.lax.fori_loop(
        1, KLEV - 1, ktcon1_scan, (aa2_0, kt1_0, cnvflg))

    # moisture in overshooting layers (ktcon..ktcon1)
    def qup2_body(k, carry):
        qcko, pwo, dellal, pwavo = carry
        dz = zi[k + 1] - zi[k]
        gamma = EL2ORC * qeso[k] / to[k] ** 2
        qrch = qeso[k] + gamma * dbyo[k] / (HVAP * (1.0 + gamma))
        tem = 0.5 * (_row(xlamb, k) + _row(xlamb, k - 1)) * dz
        tem1 = 0.5 * xlamud * dz
        factor = 1.0 + tem - tem1
        qk = ((1.0 - tem1) * _row(qcko, k - 1)
              + tem * qo_mid[k]) / factor
        zone = cnvflg & (k >= ktcon) & (k < ktcon1)
        qk = jnp.where(zone, qk, _row(qcko, k))
        qci = _row(eta, k) * (qk - qrch)
        etah = 0.5 * (_row(eta, k) + _row(eta, k - 1))
        dp = 1000.0 * del_[k]
        wet = zone & (qci > 0.0)
        use_c1 = wet & (ncloud > 0)
        qlk = jnp.where(use_c1,
                        qci / (_row(eta, k) + etah * (C0 + C1) * dz),
                        qci / (_row(eta, k) + etah * C0 * dz))
        dlal = jnp.where(use_c1, etah * C1 * dz * qlk * G / dp,
                         _row(dellal, k))
        pw = jnp.where(wet, etah * C0 * dz * qlk, _row(pwo, k))
        qk = jnp.where(wet, qlk + qrch, qk)
        pwavo = jnp.where(wet, pwavo + etah * C0 * dz * qlk, pwavo)
        return (_setrow(qcko, k, qk), _setrow(pwo, k, pw),
                _setrow(dellal, k, dlal), pwavo)

    qcko, pwo, dellal, pwavo = jax.lax.fori_loop(
        1, KLEV - 1, qup2_body, (qcko, pwo, dellal, pwavo))

    # exchange ktcon <-> ktcon1
    ktcon, ktcon1 = ktcon1, ktcon

    # liquid/vapor separation at cloud top
    ktm1 = jnp.maximum(ktcon - 1, 0)
    gamma_t = EL2ORC * _lev(qeso, ktm1) / _lev(to, ktm1) ** 2
    qrch_t = _lev(qeso, ktm1) + gamma_t * _lev(dbyo, ktm1) \
        / (HVAP * (1.0 + gamma_t))
    dq_t = _lev(qcko, ktm1) - qrch_t
    qlko_ktcon = jnp.where(cnvflg & (ncloud > 0) & (dq_t > 0.0), dq_t,
                           0.0)
    top_fix = cnvflg & (ncloud > 0) & (dq_t > 0.0)
    qcko = jnp.where((karr == ktm1[None]) & top_fix[None],
                     qrch_t[None], qcko)

    # downdraft strength from wind shear
    shear3 = jnp.sqrt((uo - jnp.concatenate([uo[:1], uo[:-1]], 0)) ** 2
                      + (vo - jnp.concatenate([vo[:1], vo[:-1]], 0))
                      ** 2)
    sh_zone = (karr > kb[None]) & (karr <= ktcon[None])
    vshear = jnp.sum(jnp.where(sh_zone, shear3, 0.0), 0)
    zdenom = _lev(zi, jnp.minimum(ktcon + 1, KLEV)) \
        - _lev(zi, jnp.minimum(kb + 1, KLEV))
    vshear = 1e3 * vshear / jnp.where(zdenom == 0, 1.0, zdenom)
    e1 = 1.591 - .639 * vshear + .0953 * vshear ** 2 \
        - .00496 * vshear ** 3
    edt = jnp.clip(1.0 - e1, 0.0, 0.9)
    edto = edt
    edtx = edt

    # downdraft detrainment profile below cloud base
    sum_zone = karr < kbcon[None]
    dz_if = zi[2:KLEV + 1] - zi[1:KLEV]
    sumx = jnp.sum(jnp.where(sum_zone[:KLEV - 1], dz_if, 0.0), 0)
    beta = jnp.where(land, BETAL, BETAS)
    kbcon_f = jnp.maximum(kbcon, 1).astype(t1.dtype)
    dzm = (sumx + zi[1]) / kbcon_f
    xlamd = (1.0 - beta ** (1.0 / kbcon_f)) / dzm

    etad = jnp.ones_like(t1)

    def etad_dn(it, etad):
        k = KLEV - 2 - it
        dz = zi[k + 2] - zi[k + 1]
        ptem_hi = XLAMDD - XLAMDE
        ptem_lo = xlamd + XLAMDD - XLAMDE
        val_hi = _row(etad, k + 1) * (1.0 - ptem_hi * dz)
        val_lo = _row(etad, k + 1) * (1.0 - ptem_lo * dz)
        use_hi = cnvflg & (k < jmin_) & (k >= kbcon)
        use_lo = cnvflg & (k < kbcon)
        out = jnp.where(use_hi, val_hi,
                        jnp.where(use_lo, val_lo, _row(etad, k)))
        return _setrow(etad, k, out)

    etad = jax.lax.fori_loop(0, KLEV - 1, etad_dn, etad)

    # downdraft properties (descent from jmin)
    def dd_props(qcd_start, hcd_start, with_pw):
        def body(it, carry):
            hcdo, qcdo, qrcdo, pwdo, pwevo = carry
            k = KLEV - 2 - it
            dz = zi[k + 2] - zi[k + 1]
            tem = XLAMDE * dz
            tem1 = jnp.where(k >= kbcon, 0.5 * XLAMDD * dz,
                             0.5 * (xlamd + XLAMDD) * dz)
            factor = 1.0 + tem - tem1
            heo_up = 0.5 * (heo[k] + heo[jnp.minimum(k + 1, KLEV - 1)])
            qo_up = 0.5 * (qo[k] + qo[jnp.minimum(k + 1, KLEV - 1)])
            hk = ((1.0 - tem1) * _row(hcdo, k + 1) + tem * heo_up) \
                / factor
            act = cnvflg & (k < jmin_)
            hk = jnp.where(act, hk, _row(hcdo, k))
            dby = hk - heso[k]
            gamma = EL2ORC * qeso[k] / to[k] ** 2
            qrcd_k = qeso[k] + (1.0 / HVAP) * (gamma / (1.0 + gamma)) \
                * dby
            qk = ((1.0 - tem1) * _row(qcdo, k + 1) + tem * qo_up) \
                / factor
            pwd = _row(etad, k + 1) * (qk - qrcd_k)
            qk_out = jnp.where(act, qrcd_k, _row(qcdo, k))
            pwdo = _setrow(pwdo, k, jnp.where(act, pwd, 0.0))
            pwevo = pwevo + jnp.where(act, pwd, 0.0)
            hcdo = _setrow(hcdo, k, hk)
            qcdo = _setrow(qcdo, k, qk_out)
            qrcdo = _setrow(qrcdo, k, jnp.where(act, qrcd_k,
                                                _row(qrcdo, k)))
            return (hcdo, qcdo, qrcdo, pwdo, pwevo)

        hcd0 = jnp.where((karr == jmin_[None]), _lev(heo, jmin_)[None],
                         zero3)
        qcd0 = jnp.where((karr == jmin_[None]), _lev(qo, jmin_)[None],
                         zero3)
        qrcd0 = jnp.where((karr == jmin_[None]),
                          _lev(qeso, jmin_)[None], zero3)
        return jax.lax.fori_loop(0, KLEV - 1, body,
                                 (hcd0, qcd0, qrcd0, zero3, zero2))

    hcdo, qcdo, qrcdo, pwdo, pwevo = dd_props(None, None, True)

    edtmax = jnp.where(slimsk == 2.0, EDTMAXS, EDTMAXL)
    edto = jnp.where(pwevo < 0.0,
                     jnp.minimum(-edto * pwavo
                                 / jnp.where(pwevo == 0, -1.0, pwevo),
                                 edtmax), 0.0)

    # downdraft cloud work function contribution
    dd_zone = karr < jmin_[None]
    dz_dn = -(jnp.concatenate([zl[1:], zl[-1:]], 0) - zl)
    dd_term = dz_dn * (G / (CP * to)) * ((hcdo - heso)
                                         / (1.0 + gamma_a)) \
        * (1.0 + FV * CP * gamma_a * to / HVAP) \
        + dz_dn * G * FV * jnp.maximum(0.0, qeso - qo)
    aa1 = aa1 + edto * jnp.sum(jnp.where(dd_zone & cnvflg[None],
                                         dd_term, 0.0), 0)
    cnvflg = cnvflg & (aa1 > 0.0)

    # ---- unit-mass-flux environmental change (dellah/q/l) --------------
    heo_km1 = jnp.concatenate([heo[:1], heo[:-1]], 0)
    qo_km1 = jnp.concatenate([qo[:1], qo[:-1]], 0)
    eta_km1 = jnp.concatenate([eta[:1], eta[:-1]], 0)
    etad_km1 = jnp.concatenate([etad[:1], etad[:-1]], 0)
    hcko_km1 = jnp.concatenate([hcko[:1], hcko[:-1]], 0)
    qcko_km1 = jnp.concatenate([qcko[:1], qcko[:-1]], 0)
    hcdo_km1 = jnp.concatenate([hcdo[:1], hcdo[:-1]], 0)
    qrcdo_km1 = jnp.concatenate([qrcdo[:1], qrcdo[:-1]], 0)
    xlamb_km1 = jnp.concatenate([xlamb[:1], xlamb[:-1]], 0)
    aup = jnp.where(karr > kb[None], 1.0, 0.0)
    adw = jnp.where(karr <= jmin_[None], 1.0, 0.0)
    dp3 = 1000.0 * del_
    dzi3 = zi[1:KLEV + 1] - zi[:KLEV]
    tem3 = 0.5 * (xlamb + xlamb_km1)
    ptem3 = XLAMDE
    ptem13 = jnp.where(karr <= kbcon[None], xlamd[None] + XLAMDD,
                       XLAMDD)
    mid = lambda a, b: 0.5 * (a + b)
    dellah = (((aup * eta - adw * edto[None] * etad) * heo
               - (aup * eta_km1 - adw * edto[None] * etad_km1) * heo_km1
               - (aup * tem3 * eta_km1 + adw * edto[None] * ptem3
                  * etad) * mid(heo, heo_km1) * dzi3
               + aup * xlamud[None] * eta_km1
               * mid(hcko, hcko_km1) * dzi3
               + adw * edto[None] * ptem13 * etad
               * mid(hcdo, hcdo_km1) * dzi3) * G / dp3)
    dellaq = (((aup * eta - adw * edto[None] * etad) * qo
               - (aup * eta_km1 - adw * edto[None] * etad_km1) * qo_km1
               - (aup * tem3 * eta_km1 + adw * edto[None] * ptem3
                  * etad) * mid(qo, qo_km1) * dzi3
               + aup * xlamud[None] * eta_km1
               * mid(qcko, qcko_km1) * dzi3
               + adw * edto[None] * ptem13 * etad
               * mid(qrcdo, qrcdo_km1) * dzi3) * G / dp3)
    interior = (karr >= 1) & (karr < ktcon[None])
    dellah = jnp.where(interior, dellah, 0.0)
    dellaq = jnp.where(interior, dellaq, 0.0)
    # surface layer: downdraft detrainment only
    dp0 = 1000.0 * del_[0]
    dellah = dellah.at[0].set(edto * etad[0] * (hcdo[0] - heo[0]) * G
                              / dp0)
    dellaq = dellaq.at[0].set(edto * etad[0] * (qcdo[0] - qo[0]) * G
                              / dp0)
    # cloud top
    at_top = karr == ktcon[None]
    dellah = jnp.where(at_top,
                       (eta_km1 * (hcko_km1 - heo_km1) * G / dp3), dellah)
    dellaq = jnp.where(at_top,
                       (eta_km1 * (qcko_km1 - qo_km1) * G / dp3), dellaq)
    dellal = jnp.where(at_top,
                       eta_km1 * qlko_ktcon[None] * G / dp3, dellal)

    # ---- trial state with unit mass flux (mbdt) ------------------------
    in_cloud_le = karr <= ktcon[None]
    qo_x = jnp.where(in_cloud_le, jnp.maximum(dellaq * MBDT + q1, 1e-10),
                     q1)
    dellat3 = (dellah - HVAP * dellaq) / CP
    to_x = jnp.where(in_cloud_le, dellat3 * MBDT + t1, t1)
    qeso_x = _qes(to_x, p)
    heo_x = G * zl + CP * to_x + HVAP * qo_x
    heso_x = G * zl + CP * to_x + HVAP * qeso_x
    to_xh, qo_xh, qeso_xh, heo_xh, heso_xh, _ = _half_level_env(
        to_x, qo_x, zl, p, None, KLEV)

    xhkb = _lev(heo_xh, kb)
    xqkb = _lev(qo_xh, kb)
    heox_mid = 0.5 * (heo_xh + jnp.concatenate([heo_xh[:1],
                                                heo_xh[:-1]], 0))
    hcko_x = _updraft_recur(kb, None, xlamb, xlamud, zi, xhkb, heox_mid,
                            cnvflg)
    qox_mid = 0.5 * (qo_xh + jnp.concatenate([qo_xh[:1], qo_xh[:-1]],
                                             0))

    def xq_body(k, carry):
        qcko_x, xpwav, xaa0 = carry
        dz = zi[k + 1] - zi[k]
        gamma = EL2ORC * qeso_xh[k] / to_xh[k] ** 2
        xdby = _row(hcko_x, k) - heso_xh[k]
        xqrch = qeso_xh[k] + gamma * xdby / (HVAP * (1.0 + gamma))
        tem = 0.5 * (_row(xlamb, k) + _row(xlamb, k - 1)) * dz
        tem1 = 0.5 * xlamud * dz
        factor = 1.0 + tem - tem1
        qk = ((1.0 - tem1) * _row(qcko_x, k - 1) + tem * qox_mid[k]) \
            / factor
        zone = cnvflg & (k > kb) & (k <= ktcon)
        qk = jnp.where(zone, qk, _row(qcko_x, k))
        dq = _row(eta, k) * (qk - xqrch)
        etah = 0.5 * (_row(eta, k) + _row(eta, k - 1))
        wet = zone & (k >= kbcon) & (dq > 0.0)
        use_c1 = wet & (ncloud > 0) & (k > jmin_)
        qlk = jnp.where(use_c1,
                        dq / (_row(eta, k) + etah * (C0 + C1) * dz),
                        dq / (_row(eta, k) + etah * C0 * dz))
        xaa0 = xaa0 - jnp.where(wet & (k < ktcon1), dz * G * qlk, 0.0)
        qk = jnp.where(wet, qlk + xqrch, qk)
        xpw = jnp.where(wet, etah * C0 * dz * qlk, 0.0)
        xpwav = xpwav + xpw
        # buoyancy part kbcon..ktcon1
        dz1 = zl[jnp.minimum(k + 1, KLEV - 1)] - zl[k]
        rfct = 1.0 + FV * CP * gamma * to_xh[k] / HVAP
        buoy_on = cnvflg & (k >= kbcon) & (k < ktcon1)
        xaa0 = xaa0 + jnp.where(
            buoy_on,
            dz1 * (G / (CP * to_xh[k])) * xdby / (1.0 + gamma) * rfct
            + dz1 * G * FV * jnp.maximum(0.0, qeso_xh[k] - qo_xh[k]),
            0.0)
        return (_setrow(qcko_x, k, qk), xpwav, xaa0)

    qcko_x0 = jnp.where((karr == kb[None]), xqkb[None], zero3)
    qcko_x, xpwav, xaa0 = jax.lax.fori_loop(
        1, KLEV - 1, xq_body, (qcko_x0, zero2, zero2))

    # x-pass downdraft
    def xdd_body(it, carry):
        xhcd, xqcd, qrcd, xpwev = carry
        k = KLEV - 2 - it
        dz = zi[k + 2] - zi[k + 1]
        tem = XLAMDE * dz
        tem1 = jnp.where(k >= kbcon, 0.5 * XLAMDD * dz,
                         0.5 * (xlamd + XLAMDD) * dz)
        factor = 1.0 + tem - tem1
        heo_up = 0.5 * (heo_xh[k] + heo_xh[jnp.minimum(k + 1,
                                                       KLEV - 1)])
        qo_up = 0.5 * (qo_xh[k] + qo_xh[jnp.minimum(k + 1, KLEV - 1)])
        act = cnvflg & (k < jmin_)
        hk = ((1.0 - tem1) * _row(xhcd, k + 1) + tem * heo_up) / factor
        hk = jnp.where(act, hk, _row(xhcd, k))
        gamma = EL2ORC * qeso_xh[k] / to_xh[k] ** 2
        dh = hk - heso_xh[k]
        qrcd_k = qeso_xh[k] + (1.0 / HVAP) * (gamma / (1.0 + gamma)) \
            * dh
        qk = ((1.0 - tem1) * _row(xqcd, k + 1) + tem * qo_up) / factor
        xpwd = _row(etad, k + 1) * (qk - qrcd_k)
        xpwev = xpwev + jnp.where(act, xpwd, 0.0)
        return (_setrow(xhcd, k, hk),
                _setrow(xqcd, k, jnp.where(act, qrcd_k, _row(xqcd, k))),
                _setrow(qrcd, k, jnp.where(act, qrcd_k, _row(qrcd, k))),
                xpwev)

    xhcd0 = jnp.where((karr == jmin_[None]), _lev(heo_xh, jmin_)[None],
                      zero3)
    xqcd0 = jnp.where((karr == jmin_[None]), _lev(qo_xh, jmin_)[None],
                      zero3)
    qrcd0 = jnp.where((karr == jmin_[None]),
                      _lev(qeso_xh, jmin_)[None], zero3)
    xhcd, xqcd, qrcd, xpwev = jax.lax.fori_loop(
        0, KLEV - 1, xdd_body, (xhcd0, xqcd0, qrcd0, zero2))

    edtx = jnp.where(xpwev < 0.0,
                     jnp.minimum(-edtx * xpwav
                                 / jnp.where(xpwev == 0, -1.0, xpwev),
                                 edtmax), 0.0)
    gamma_x = EL2ORC * qeso_xh / to_xh ** 2
    xdd_term = dz_dn * (G / (CP * to_xh)) * ((xhcd - heso_xh)
                                             / (1.0 + gamma_x)) \
        * (1.0 + FV * CP * gamma_x * to_xh / HVAP) \
        + dz_dn * G * FV * jnp.maximum(0.0, qeso_xh - qo_xh)
    xaa0 = xaa0 + edtx * jnp.sum(jnp.where(dd_zone & cnvflg[None],
                                           xdd_term, 0.0), 0)

    # ---- closure -------------------------------------------------------
    p_top = _lev(p, ktcon)
    acrit_c = jnp.interp(p_top, jnp.asarray(PCRIT[::-1].copy()),
                         jnp.asarray(ACRIT[::-1].copy()))
    acrit_c = jnp.where(p_top < PCRIT[-1],
                        ACRIT[-1] * (975.0 - p_top)
                        / (975.0 - PCRIT[-1]), acrit_c)
    acrtfct = jnp.where(pdot <= w4, (pdot - w4) / (w3 - w4),
                        jnp.where(pdot >= -w4,
                                  -(pdot + w4) / (w4 - w3), 0.0))
    acrtfct = 1.0 - jnp.clip(acrtfct, -1.0, 1.0)
    dtconv = jnp.clip(dt2 + jnp.maximum(1800.0 - dt2, 0.0) * (pdot - w2)
                      / (w1 - w2), dtmin, dtmax)
    f_cl = (aa1 - acrit_c * acrtfct) / dtconv
    cnvflg = cnvflg & (f_cl > 0.0)
    xk = (xaa0 - aa1) / MBDT
    cnvflg = cnvflg & (xk < 0.0)
    xmb = jnp.minimum(-f_cl / jnp.where(xk == 0, -1.0, xk), xmbmax)

    # ---- feedback ------------------------------------------------------
    apply = cnvflg[None] & in_cloud_le
    dellat3 = (dellah - HVAP * dellaq) / CP
    t1n = jnp.where(apply, t1 + dellat3 * xmb[None] * dt2, t1)
    q1n = jnp.where(apply, q1 + dellaq * xmb[None] * dt2, q1)
    qeso_n = _qes(t1n, p)

    # rain contributions per layer; adw for rain is k<jmin
    # (cu_nsas.f90 rain loop uses adw=0 for k.ge.jmin)
    adw_rain = jnp.where(karr < jmin_[None], 1.0, 0.0)
    contrib = (aup * pwo + adw_rain * edto[None] * pwdo) \
        * xmb[None] * .001 * dt2
    contrib = jnp.where(cnvflg[None] & (karr < ktcon[None]), contrib,
                        0.0)
    rntot = jnp.sum(contrib, 0)

    # rain evaporation sweep (top-down with running rain)
    evef = jnp.where(land, edt * EVFACTL, edt * EVFACTS)

    def rain_body(it, carry):
        rain, delqev, flg, t1n, q1n, dellaq_c = carry
        k = KLEV - 1 - it
        add = _row(contrib, k)
        rain = rain + add
        qeso_k = _qes(_row(t1n, k), p[k])
        qcond = evef * (_row(q1n, k) - qeso_k) \
            / (1.0 + EL2ORC * qeso_k / _row(t1n, k) ** 2)
        dp = 1000.0 * del_[k]
        active = cnvflg & flg & (k < ktcon)
        has_rain = active & (rain > 0.0) & (qcond < 0.0)
        qevap = jnp.where(has_rain,
                          -qcond * (1.0 - jnp.exp(
                              -.32 * jnp.sqrt(dt2
                                              * jnp.maximum(rain, 0.)))),
                          0.0)
        qevap = jnp.minimum(qevap, jnp.maximum(rain, 0.) * 1000. * G
                            / dp)
        delq2 = delqev + .001 * qevap * dp / G
        over = has_rain & (delq2 > rntot)
        qevap = jnp.where(over, 1000. * G * (rntot - delqev) / dp,
                          qevap)
        flg = flg & ~over
        doit = (rain > 0.0) & (qevap > 0.0) & active
        q1n = _setrow(q1n, k, jnp.where(doit, _row(q1n, k) + qevap,
                                        _row(q1n, k)))
        t1n = _setrow(t1n, k, jnp.where(doit,
                                        _row(t1n, k) - (HVAP / CP)
                                        * qevap, _row(t1n, k)))
        rain = jnp.where(doit, rain - .001 * qevap * dp / G, rain)
        delqev = delqev + jnp.where(doit, .001 * dp * qevap / G, 0.0)
        return (rain, delqev, flg, t1n, q1n, dellaq_c)

    rain0 = zero2
    rain, delqev, flg_e, t1n, q1n, _ = jax.lax.fori_loop(
        0, KLEV, rain_body, (rain0, zero2, cnvflg, t1n, q1n, dellaq))

    rain = jnp.where(cnvflg & (rain < 0.) & ~flg_e, 0.0, rain)
    rain = jnp.maximum(rain, 0.0)
    has_rain = cnvflg & (rain > 0.0)
    ktop = jnp.where(has_rain, ktcon, 0)
    kbot = jnp.where(has_rain, kbcon, KLEV)
    icps = jnp.where(has_rain, 1, 0)

    # convection without rain is cancelled entirely
    t1n = jnp.where(has_rain[None], t1n, t1)
    q1n = jnp.where(has_rain[None], q1n, q1)

    # detrained cloud water / ice
    det_zone = has_rain[None] & (karr >= kbcon[None]) \
        & (karr <= ktcon[None])
    tem_d = dellal * xmb[None] * dt2
    fice = jnp.clip((TCR - t1n) * TCRF, 0.0, 1.0)
    if ncloud >= 2:
        qi2 = qi2 + jnp.where(det_zone, tem_d * fice, 0.0)
        qc2 = qc2 + jnp.where(det_zone, tem_d * (1.0 - fice), 0.0)
    elif ncloud > 0:
        qc2 = qc2 + jnp.where(det_zone, tem_d, 0.0)
    return t1n, q1n, qc2, qi2, rain, kbot, ktop, icps


def nsas_shallow(delt, del_, prsl_mb, prsi_mb, zl, ncloud, qc2, qi2,
                 q1, t1, slimsk, dot, u1, v1, hpbl, hfx, qfx, icps,
                 theta1):
    """Shallow SAS (nscv2d). Non-precipitating shallow convection for
    columns where deep convection did not act; PBL-buoyancy-flux mass
    closure (Grant 2001). Returns (t1, q1, qc2, qi2, rain_m)."""
    KLEV = t1.shape[0]
    shape2 = t1.shape[1:]
    karr = jnp.arange(KLEV)[:, None, None]
    dt2 = delt
    zero2 = jnp.zeros(shape2, t1.dtype)
    zero3 = jnp.zeros_like(t1)
    C1S = 5e-4
    CLAM_S = 0.3
    BETAW = 0.03
    land = slimsk == 1.0
    w1 = jnp.where(land, -8e-3, -2e-4)
    w2 = jnp.where(land, -4e-2, -2e-3)
    w3 = jnp.where(land, -5e-3, -1e-3)
    w4 = jnp.where(land, -5e-4, -2e-5)

    p = prsl_mb
    # surface buoyancy flux (cu_nsas.f90:2349-2368); p is mb -> *100 Pa
    rhox = p[0] * 100.0 / (RD * t1[0] * (1.0 + FV * q1[0]))
    sflx = hfx / rhox / CP + qfx / rhox * FV * theta1
    cnvflg = (icps != 1) & (sflx > 0.0)

    kbm = jnp.minimum(
        jnp.sum((p > prsi_mb[0][None] * 0.70).astype(jnp.int32), 0),
        KLEV - 1).astype(jnp.int32)
    kmaxc = jnp.minimum(
        jnp.sum((p > prsi_mb[0][None] * 0.60).astype(jnp.int32), 0),
        KLEV - 1).astype(jnp.int32)
    kbm = jnp.minimum(kbm, kmaxc)

    zi = jnp.concatenate([zl[:1] * 0.0, 0.5 * (zl[:-1] + zl[1:]),
                          zl[-1:]], 0)
    xlamue = CLAM_S / zi[1:KLEV + 1]
    xlamue = xlamue.at[KLEV - 1].set(xlamue[KLEV - 2])

    # pbl top index
    below = zl <= hpbl[None]
    kpbl = jnp.maximum(jnp.sum(jnp.cumprod(
        below.astype(jnp.int32), 0), 0) - 1, 0).astype(jnp.int32)
    kpbl = jnp.minimum(kpbl, kbm)

    to = t1
    qo = jnp.maximum(q1, 1e-10)
    uo = u1
    vo = v1
    qeso = jnp.maximum(_qes(to, p), 1e-8)
    heo = G * zl + CP * to + HVAP * qo
    heso = G * zl + CP * to + HVAP * qeso

    hmasked = jnp.where(karr <= kpbl[None], heo, -jnp.inf)
    kb = jnp.argmax(hmasked, axis=0).astype(jnp.int32)

    to, qo, qeso, heo, heso, po = _half_level_env(to, qo, zl, p, None,
                                                  KLEV)
    qeso = jnp.maximum(qeso, 1e-8)
    hkb = _lev(heo, kb)

    lfc = (karr > kb[None]) & (hkb[None] > heso) & (karr < kbm[None])
    kbcon = _first_above(lfc, None, KLEV - 1)
    cnvflg = cnvflg & (kbcon < KLEV - 1)

    pdot = 10.0 * _lev(dot, kbcon)
    ptem = jnp.where(pdot <= w4, (pdot - w4) / (w3 - w4),
                     jnp.where(pdot >= -w4, -(pdot + w4) / (w4 - w3),
                               0.0))
    ptem = 1.0 - jnp.clip(ptem, -1.0, 1.0)
    cincr = CINCRMAX - ptem * 0.5 * (CINCRMAX - CINCRMIN)
    cnvflg = cnvflg & ((_lev(p, kb) - _lev(p, kbcon)) <= cincr)

    xlamud = _lev(xlamue, kbcon)
    eta = jnp.ones_like(t1)

    def eta_dn(it, eta):
        k = KLEV - 2 - it
        dz = zi[k + 2] - zi[k + 1]
        ptem_ = 0.5 * (_row(xlamue, k) + _row(xlamue, k + 1)) - xlamud
        val = _row(eta, k + 1) / (1.0 + ptem_ * dz)
        use = cnvflg & (k < kbcon) & (k >= kb)
        return _setrow(eta, k, jnp.where(use, val, _row(eta, k)))

    eta = jax.lax.fori_loop(0, KLEV - 2, eta_dn, eta)

    def eta_up(k, eta):
        dz = zi[k + 1] - zi[k]
        ptem_ = 0.5 * (_row(xlamue, k) + _row(xlamue, k - 1)) - xlamud
        val = _row(eta, k - 1) * (1.0 + ptem_ * dz)
        use = cnvflg & (k > kbcon) & (k < kmaxc)
        return _setrow(eta, k, jnp.where(use, val, _row(eta, k)))

    eta = jax.lax.fori_loop(1, KLEV - 1, eta_up, eta)

    heo_mid = 0.5 * (heo + jnp.concatenate([heo[:1], heo[:-1]], 0))
    hcko = _updraft_recur(kb, None, xlamue, xlamud, zi, hkb, heo_mid,
                          cnvflg)
    dbyo = hcko - heso

    kbcon1 = _first_above((karr >= kbcon[None]) & (dbyo > 0.0)
                          & (karr < kbm[None]), None, KLEV - 1)
    cnvflg = cnvflg & (kbcon1 < KLEV - 1)
    cnvflg = cnvflg & ((_lev(p, kbcon) - _lev(p, kbcon1)) <= DTHK)

    ktcon = _first_above((karr > kbcon1[None]) & (dbyo < 0.0)
                         & (karr < kbm[None]), None, kbm)

    xmbmax = 1000.0 * _lev(del_, kbcon) / (G * dt2)

    qo_mid = 0.5 * (qo + jnp.concatenate([qo[:1], qo[:-1]], 0))

    def q_body(k, carry):
        qcko, pwo, dellal, aa1 = carry
        dz = zi[k + 1] - zi[k]
        gamma = EL2ORC * qeso[k] / to[k] ** 2
        qrch = qeso[k] + gamma * dbyo[k] / (HVAP * (1.0 + gamma))
        tem = 0.5 * (_row(xlamue, k) + _row(xlamue, k - 1)) * dz
        tem1 = 0.5 * xlamud * dz
        factor = 1.0 + tem - tem1
        qk = ((1.0 - tem1) * _row(qcko, k - 1) + tem * qo_mid[k]) \
            / factor
        zone = cnvflg & (k > kb) & (k < ktcon)
        qk = jnp.where(zone, qk, _row(qcko, k))
        dq = _row(eta, k) * (qk - qrch)
        etah = 0.5 * (_row(eta, k) + _row(eta, k - 1))
        dp = 1000.0 * del_[k]
        wet = zone & (k >= kbcon) & (dq > 0.0)
        qlk = jnp.where(ncloud > 0,
                        dq / (_row(eta, k) + etah * (C0 + C1S) * dz),
                        dq / (_row(eta, k) + etah * C0 * dz))
        dlal = jnp.where(wet & (ncloud > 0),
                         etah * C1S * dz * qlk * G / dp, 0.0)
        aa1 = aa1 - jnp.where(wet, dz * G * qlk, 0.0)
        qk = jnp.where(wet, qlk + qrch, qk)
        pw = jnp.where(wet, etah * C0 * dz * qlk, 0.0)
        return (_setrow(qcko, k, qk), _setrow(pwo, k, pw),
                _setrow(dellal, k, dlal), aa1)

    qcko0 = jnp.where((karr == kb[None]), _lev(qo, kb)[None], zero3)
    qcko, pwo, dellal, aa1 = jax.lax.fori_loop(
        1, KLEV - 1, q_body, (qcko0, zero3, zero3, zero2))

    dz1_arr = jnp.concatenate([zl[1:] - zl[:-1], zl[-1:] * 0 + 1.0], 0)
    gamma_a = EL2ORC * qeso / to ** 2
    rfact = 1.0 + FV * CP * gamma_a * to / HVAP
    cwf_term = dz1_arr * (G / (CP * to)) * dbyo / (1.0 + gamma_a) \
        * rfact + dz1_arr * G * FV * jnp.maximum(0.0, qeso - qo)
    cwf_zone = (karr >= kbcon[None]) & (karr < ktcon[None])
    aa1 = aa1 + jnp.sum(jnp.where(cwf_zone & cnvflg[None], cwf_term,
                                  0.0), 0)
    cnvflg = cnvflg & (aa1 > 0.0)

    # overshoot
    def kt1_scan(k, carry):
        aa, kt1, flg = carry
        act = flg & (k >= ktcon) & (k < kbm)
        aa = aa + jnp.where(act, cwf_term[k], 0.0)
        hit = act & (aa < 0.0)
        kt1 = jnp.where(hit, k, kt1)
        flg = flg & ~hit
        return (aa, kt1, flg)

    _, ktcon1, _ = jax.lax.fori_loop(
        1, KLEV - 1, kt1_scan,
        (AAFAC * aa1, kbm, cnvflg))

    def q2_body(k, carry):
        qcko, pwo, dellal = carry
        dz = zi[k + 1] - zi[k]
        gamma = EL2ORC * qeso[k] / to[k] ** 2
        qrch = qeso[k] + gamma * dbyo[k] / (HVAP * (1.0 + gamma))
        tem = 0.5 * (_row(xlamue, k) + _row(xlamue, k - 1)) * dz
        tem1 = 0.5 * xlamud * dz
        factor = 1.0 + tem - tem1
        qk = ((1.0 - tem1) * _row(qcko, k - 1) + tem * qo_mid[k]) \
            / factor
        zone = cnvflg & (k >= ktcon) & (k < ktcon1)
        qk = jnp.where(zone, qk, _row(qcko, k))
        dq = _row(eta, k) * (qk - qrch)
        etah = 0.5 * (_row(eta, k) + _row(eta, k - 1))
        dp = 1000.0 * del_[k]
        wet = zone & (dq > 0.0)
        qlk = jnp.where(ncloud > 0,
                        dq / (_row(eta, k) + etah * (C0 + C1S) * dz),
                        dq / (_row(eta, k) + etah * C0 * dz))
        dlal = jnp.where(wet & (ncloud > 0),
                         etah * C1S * dz * qlk * G / dp,
                         _row(dellal, k))
        qk = jnp.where(wet, qlk + qrch, qk)
        pw = jnp.where(wet, etah * C0 * dz * qlk, _row(pwo, k))
        return (_setrow(qcko, k, qk), _setrow(pwo, k, pw),
                _setrow(dellal, k, dlal))

    qcko, pwo, dellal = jax.lax.fori_loop(1, KLEV - 1, q2_body,
                                          (qcko, pwo, dellal))
    ktcon, ktcon1 = ktcon1, ktcon

    ktm1 = jnp.maximum(ktcon - 1, 0)
    gamma_t = EL2ORC * _lev(qeso, ktm1) / _lev(to, ktm1) ** 2
    qrch_t = _lev(qeso, ktm1) + gamma_t * _lev(dbyo, ktm1) \
        / (HVAP * (1.0 + gamma_t))
    dq_t = _lev(qcko, ktm1) - qrch_t
    qlko_ktcon = jnp.where(cnvflg & (ncloud > 0) & (dq_t > 0.0), dq_t,
                           0.0)

    # precipitation efficiency (evaporation factor only)
    shear3 = jnp.sqrt((uo - jnp.concatenate([uo[:1], uo[:-1]], 0)) ** 2
                      + (vo - jnp.concatenate([vo[:1], vo[:-1]], 0))
                      ** 2)
    sh_zone = (karr > kb[None]) & (karr <= ktcon[None])
    vshear = jnp.sum(jnp.where(sh_zone, shear3, 0.0), 0)
    zden = _lev(zi, jnp.minimum(ktcon + 1, KLEV)) \
        - _lev(zi, jnp.minimum(kb + 1, KLEV))
    vshear = 1e3 * vshear / jnp.where(zden == 0, 1.0, zden)
    e1 = 1.591 - .639 * vshear + .0953 * vshear ** 2 \
        - .00496 * vshear ** 3
    edt = jnp.clip(1.0 - e1, 0.0, 0.9)

    # unit-mass-flux environment change (updraft only)
    heo_km1 = jnp.concatenate([heo[:1], heo[:-1]], 0)
    qo_km1 = jnp.concatenate([qo[:1], qo[:-1]], 0)
    eta_km1 = jnp.concatenate([eta[:1], eta[:-1]], 0)
    hcko_km1 = jnp.concatenate([hcko[:1], hcko[:-1]], 0)
    qcko_km1 = jnp.concatenate([qcko[:1], qcko[:-1]], 0)
    xlam_km1 = jnp.concatenate([xlamue[:1], xlamue[:-1]], 0)
    dp3 = 1000.0 * del_
    dzi3 = zi[1:KLEV + 1] - zi[:KLEV]
    tem3 = 0.5 * (xlamue + xlam_km1)
    dellah = ((eta * heo - eta_km1 * heo_km1
               - tem3 * eta_km1 * 0.5 * (heo + heo_km1) * dzi3
               + xlamud[None] * eta_km1 * 0.5 * (hcko + hcko_km1)
               * dzi3) * G / dp3)
    dellaq = ((eta * qo - eta_km1 * qo_km1
               - tem3 * eta_km1 * 0.5 * (qo + qo_km1) * dzi3
               + xlamud[None] * eta_km1 * 0.5 * (qcko + qcko_km1)
               * dzi3) * G / dp3)
    interior = (karr > kb[None]) & (karr < ktcon[None])
    dellah = jnp.where(interior, dellah, 0.0)
    dellaq = jnp.where(interior, dellaq, 0.0)
    at_top = karr == ktcon[None]
    dellah = jnp.where(at_top, eta_km1 * (hcko_km1 - heo_km1) * G / dp3,
                       dellah)
    dellaq = jnp.where(at_top, eta_km1 * (qcko_km1 - qo_km1) * G / dp3,
                       dellaq)
    dellal = jnp.where(at_top, eta_km1 * qlko_ktcon[None] * G / dp3,
                       dellal)

    # Grant (2001) mass flux closure
    wstar = jnp.maximum(G * sflx * hpbl / t1[0], 1e-20) ** (1.0 / 3.0)
    tem_rho = _lev(po, kbcon) * 100.0 / (RD * _lev(t1, kbcon))
    xmb = jnp.minimum(BETAW * tem_rho * wstar, xmbmax)

    apply = cnvflg[None] & (karr > kb[None]) & (karr <= ktcon[None])
    dellat3 = (dellah - HVAP * dellaq) / CP
    t1n = jnp.where(apply, t1 + dellat3 * xmb[None] * dt2, t1)
    q1n = jnp.where(apply, q1 + dellaq * xmb[None] * dt2, q1)

    contrib = jnp.where(cnvflg[None] & (karr < ktcon[None])
                        & (karr > kb[None]),
                        pwo * xmb[None] * .001 * dt2, 0.0)
    rntot = jnp.sum(contrib, 0)
    evef_fac = jnp.where(land, edt * EVFACTL, edt * EVFACTS)

    def rain_body(it, carry):
        rain, delqev, flg, t1n, q1n = carry
        k = KLEV - 1 - it
        rain = rain + _row(contrib, k)
        qeso_k = jnp.maximum(_qes(_row(t1n, k), p[k]), 1e-8)
        qcond = evef_fac * (_row(q1n, k) - qeso_k) \
            / (1.0 + EL2ORC * qeso_k / _row(t1n, k) ** 2)
        dp = 1000.0 * del_[k]
        active = flg & (k < ktcon)
        has = active & (rain > 0.0) & (qcond < 0.0)
        qevap = jnp.where(has, -qcond * (1.0 - jnp.exp(
            -.32 * jnp.sqrt(dt2 * jnp.maximum(rain, 0.)))), 0.0)
        qevap = jnp.minimum(qevap, jnp.maximum(rain, 0.) * 1000. * G
                            / dp)
        delq2 = delqev + .001 * qevap * dp / G
        over = has & (delq2 > rntot)
        qevap = jnp.where(over, 1000. * G * (rntot - delqev) / dp,
                          qevap)
        flg = flg & ~over
        doit = has & (qevap > 0.0)
        tem_m = .001 * dp / G
        exceeds = doit & (qevap * tem_m > rain)
        qevap = jnp.where(exceeds, rain / tem_m, qevap)
        rain = jnp.where(doit, jnp.where(exceeds, 0.0,
                                         rain - qevap * tem_m), rain)
        q1n = _setrow(q1n, k, jnp.where(doit, _row(q1n, k) + qevap,
                                        _row(q1n, k)))
        t1n = _setrow(t1n, k, jnp.where(doit, _row(t1n, k)
                                        - (HVAP / CP) * qevap,
                                        _row(t1n, k)))
        delqev = delqev + jnp.where(doit, .001 * dp * qevap / G, 0.0)
        return (rain, delqev, flg, t1n, q1n)

    rain, _, flg_e, t1n, q1n = jax.lax.fori_loop(
        0, KLEV, rain_body, (zero2, zero2, cnvflg, t1n, q1n))
    rain = jnp.where(cnvflg & ((rain < 0.0) | ~flg_e), 0.0, rain)

    det_zone = cnvflg[None] & (karr >= kbcon[None]) \
        & (karr <= ktcon[None])
    tem_d = dellal * xmb[None] * dt2
    fice = jnp.clip((TCR - t1n) * TCRF, 0.0, 1.0)
    if ncloud >= 2:
        qi2 = qi2 + jnp.where(det_zone, tem_d * fice, 0.0)
        qc2 = qc2 + jnp.where(det_zone, tem_d * (1.0 - fice), 0.0)
    elif ncloud > 0:
        qc2 = qc2 + jnp.where(det_zone, tem_d, 0.0)
    return t1n, q1n, qc2, qi2, rain


def nsas(u, v, w_if, t, qv, qc, qi, rho, p, p_i, dz, exner, hpbl, hfx,
         qfx, xland, dx, dt, mp_physics=5, dx_factor_nsas=None):
    """Full NSAS step: deep then shallow (cu_nsas wrapper,
    cu_nsas.f90:8-308). Inputs bottom-up (z, y, x); returns
    (th_new, qv_new, qc_new, qi_new, rain_delta_mm)."""
    ncloud = 0 if mp_physics == 0 else (1 if mp_physics in (1, 3) else 2)
    if dx_factor_nsas is None:
        dx_factor_nsas = 1 if dx <= 1000.0 else 2
    nz = t.shape[0]
    dot = -5.0e-4 * G * rho * (w_if[:-1] + w_if[1:])
    zii = jnp.concatenate([jnp.zeros_like(dz[:1]), jnp.cumsum(dz, 0)],
                          0)
    zl = 0.5 * (zii[:-1] + zii[1:])
    prsl_cb = p * 0.001          # cb
    prsi_cb = p_i * 0.001
    del_cb = prsl_cb * G / RD * dz / t
    prsl_mb = prsl_cb * 10.0
    prsi_mb = prsi_cb * 10.0
    slimsk = jnp.abs(xland - 2.0)

    t1, q1, qc2, qi2, rain_d, kbot, ktop, icps = nsas_deep(
        dt, dx, del_cb, prsl_mb, prsi_mb, zl, ncloud, qc, qi, qv, t,
        slimsk, dot, u, v, dx_factor_nsas)
    t1, q1, qc2, qi2, rain_s = nsas_shallow(
        dt, del_cb, prsl_mb, prsi_mb, zl, ncloud, qc2, qi2, q1, t1,
        slimsk, dot, u, v, hpbl, hfx, qfx, icps, t1[0] / exner[0])
    rain_mm = (rain_d + rain_s) * 1000.0
    th_new = t1 / exner
    return th_new, q1, qc2, qi2, rain_mm
