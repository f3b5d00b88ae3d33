"""Betts-Miller-Janjic (BMJ) cumulus convection.

JAX re-implementation of /root/reference/src/physics/cu_bmj.f90: the
Janjic (1994, 2000) convective-adjustment scheme. Deep convection
relaxes T/q toward reference profiles anchored at cloud base whose
moisture deficit (saturation-pressure departure, DSP) depends on a
prognostic cloud efficiency (CLDEFI); an enthalpy-conservation
correction makes the adjustment precipitate exactly the column-enthalpy
surplus. Non-precipitating shallow convection performs a mixing-line
adjustment with zero net column heating.

The scheme is a column adjustment built on saturation-point /
moist-adiabat lookup tables (see bmj_tables.py). It works top-down
(L=1 at the model top, cu_bmj.f90:300-306), so arrays are flipped at
entry. Vectorized over (ny, nx); per-level Fortran loops with carries
become lax.fori_loop scans with full-array carries.

Parity notes: the parcel-entrainment block and several alternate
cloud-top searches are commented out in the reference and omitted here;
the Slingo cloud-fraction / QCCONV radiative-feedback outputs of BMJDRV
are computed by the reference but never consumed anywhere in ICAR
(local arrays in cu_driver.f90), so they are not ported. LPBL is passed
but unused in the reference scheme. Momentum is untouched (BMJ has no
momentum tendencies).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.indexing import take_level
import numpy as np

from .bmj_tables import (A2, A3, A4, CAPA, ELOCP, ITB, ITBQ, JTB, JTBQ,
                         PH, PL, PLQ, PQ0, RDP, RDPQ, RDQ, RDTH, RDTHE,
                         RDTHEQ, THL, get_tables)

CP = 1004.6
RD = 287.0
G = 9.81
ELWV = 2.5e6
ROW = 1.0e3
RCP = 1.0 / CP
CPRLG = CP / (ROW * G * ELWV)

# scheme parameters (cu_bmj.f90:15-47)
DSPC = -3000.0
DTTOP = 0.0
EFIFC = 5.0
EFIMN = 0.20
EFMNT = 0.70
EPSDN = 1.05
EPSDT = 0.0
EPSNTP = 1e-4
EPSPR = 1e-7
FR = 1.0
FSL = 0.85
FSS = 0.85
PBM = 13000.0
PFRZ = 15000.0
PNO = 1000.0
PONE = 2500.0
PQM = 20000.0
PSH = 20000.0
PSHU = 45000.0
RHLSC = 0.0
RHHSC = 1.10
STABDF = 0.90
STABDS = 0.90
STABS = 1.0
DTSHAL = -1.0
TREL = 2400.0
RSFCP = 1.0 / 101300.0
AVGEFI = (EFIMN + 1.0) * 0.5
TFRZ = 273.15
EPSQ = 1e-12
ITREFI_MAX = 3

DSPBFL = -3875.0 * FR
DSP0FL = -5875.0 * FR
DSPTFL = -1875.0 * FR
DSPBFS, DSP0FS, DSPTFS = -3875.0, -5875.0, -1875.0
DSPBSL, DSP0SL, DSPTSL = DSPBFL * FSL, DSP0FL * FSL, DSPTFL * FSL
DSPBSS, DSP0SS, DSPTSS = DSPBFS * FSS, DSP0FS * FSS, DSPTFS * FSS
ELEVFC = 0.6
STEFI = 1.0
SLOPBL = (DSPBFL - DSPBSL) / (1.0 - EFIMN)
SLOP0L = (DSP0FL - DSP0SL) / (1.0 - EFIMN)
SLOPTL = (DSPTFL - DSPTSL) / (1.0 - EFIMN)
SLOPBS = (DSPBFS - DSPBSS) / (1.0 - EFIMN)
SLOP0S = (DSP0FS - DSP0SS) / (1.0 - EFIMN)
SLOPTS = (DSPTFS - DSPTSS) / (1.0 - EFIMN)
SLOPST = (STABDF - STABDS) / (1.0 - EFIMN)
SLOPE = (1.0 - EFMNT) / (1.0 - EFIMN)
A23M4L = A2 * (A3 - A4) * ELWV


def _row(a, i):
    return jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)


def _setrow(a, i, v):
    return jax.lax.dynamic_update_index_in_dim(a, v, i, 0)


def _lev(arr, kidx):
    return take_level(arr, kidx)


def _qs(t, p):
    return PQ0 / p * jnp.exp(A2 * (t - A3) / (t - A4))


def _interp1(base, idx_f, n):
    """Linear 1-D table lookup with Fortran-style edge clamping:
    idx_f is the real-valued 0-based position."""
    i0 = jnp.clip(jnp.floor(idx_f).astype(jnp.int32), 0, n - 2)
    frac = jnp.clip(idx_f - i0, 0.0, None)
    frac = jnp.where((idx_f < 0.0) | (idx_f >= n - 1), 0.0, frac)
    return base[i0], base[i0 + 1], frac, i0


def _ptbl_lookup(thbt, qbt, tables):
    """Saturation-point pressure from PTBL (cu_bmj.f90:565-608)."""
    qs0 = jnp.asarray(tables["qs0"])
    sqs = jnp.asarray(tables["sqs"])
    ptbl = jnp.asarray(tables["ptbl"])
    tth = (thbt - THL) * RDTH
    b0, b1, qq1, it = _interp1(qs0, tth, JTB)
    s0, s1, _, _ = _interp1(sqs, tth, JTB)
    bq = (b1 - b0) * qq1 + b0
    sq = (s1 - s0) * qq1 + s0
    tq = (qbt - bq) / sq * RDQ
    iq = jnp.clip(jnp.floor(tq).astype(jnp.int32), 0, ITB - 2)
    pp1 = jnp.clip(tq - iq, 0.0, None)
    pp1 = jnp.where((tq < 0.0) | (tq >= ITB - 1), 0.0, pp1)
    p00 = ptbl[iq, it]
    p10 = ptbl[iq + 1, it]
    p01 = ptbl[iq, it + 1]
    p11 = ptbl[iq + 1, it + 1]
    return p00 + (p10 - p00) * pp1 + (p01 - p00) * qq1 \
        + (p00 - p10 - p01 + p11) * pp1 * qq1


def _ttblex(p, thesp, tables):
    """Moist-adiabat temperature from the coarse or fine theta_e table
    (TTBLEX, cu_bmj.f90:1737-1820), blended on p < PLQ."""
    def one(plx, rdpx, rdthex, the0, sthe, ttbl, nI, nJ):
        tpk = (p - plx) * rdpx
        ip = jnp.clip(jnp.floor(tpk).astype(jnp.int32), 0, nI - 2)
        qq = jnp.clip(tpk - ip, 0.0, None)
        qq = jnp.where((tpk < 0.0) | (tpk >= nI - 1), 0.0, qq)
        bth = (the0[ip + 1] - the0[ip]) * qq + the0[ip]
        sth = (sthe[ip + 1] - sthe[ip]) * qq + sthe[ip]
        tth = (thesp - bth) / sth * rdthex
        ith = jnp.clip(jnp.floor(tth).astype(jnp.int32), 0, nJ - 2)
        pp = jnp.clip(tth - ith, 0.0, None)
        pp = jnp.where((tth < 0.0) | (tth >= nJ - 1), 0.0, pp)
        t00 = ttbl[ith, ip]
        t10 = ttbl[ith + 1, ip]
        t01 = ttbl[ith, ip + 1]
        t11 = ttbl[ith + 1, ip + 1]
        return t00 + (t10 - t00) * pp + (t01 - t00) * qq \
            + (t00 - t10 - t01 + t11) * pp * qq

    t_coarse = one(PL, RDP, RDTHE, jnp.asarray(tables["the0"]),
                   jnp.asarray(tables["sthe"]),
                   jnp.asarray(tables["ttbl"]), ITB, JTB)
    t_fine = one(PLQ, RDPQ, RDTHEQ, jnp.asarray(tables["the0q"]),
                 jnp.asarray(tables["stheq"]),
                 jnp.asarray(tables["ttblq"]), ITBQ, JTBQ)
    return jnp.where(p < PLQ, t_coarse, t_fine)


def _bmj_column(dtcnvc, sm, cldefi, dprs, p, q, t, psfc, tables):
    """The BMJ adjustment (cu_bmj.f90:393-1731), vectorized over
    (ny, nx). Arrays are TOP-DOWN (index 0 = model top); q is specific
    humidity. Returns (dtdt, dqdt, pcpcol[m], cldefi)."""
    KLEV = t.shape[0]
    LMH = KLEV - 1                   # lowest layer index (sigma mode)
    shape2 = t.shape[1:]
    karr = jnp.arange(KLEV)[:, None, None]
    zero2 = jnp.zeros(shape2, t.dtype)
    zero3 = jnp.zeros_like(t)
    tauk = dtcnvc / TREL
    tauksc = dtcnvc / TREL
    rdtcnvc = 1.0 / dtcnvc
    depmin = PSH * psfc * RSFCP
    sm1 = 1.0 - sm

    ape = (1.0e5 / p) ** CAPA
    plmh = p[LMH]
    pelevfc = plmh * ELEVFC
    pbtmx = plmh - PONE

    # ---- search over trial parcel levels for maximum instability -------
    # (max_buoy_loop, cu_bmj.f90:556-882)
    def parcel_props(kb):
        qbt = _lev(q, kb)
        thbt = _lev(t, kb) * _lev(ape, kb)
        psp = _ptbl_lookup(thbt, qbt, tables)
        apes = (1.0e5 / psp) ** CAPA
        thesp = thbt * jnp.exp(ELOCP * qbt * apes / thbt)
        # cloud base: level just below psp (and below PQM)
        cond = (p < psp) & (p >= PQM)
        lbot0 = jnp.max(jnp.where(cond & (karr < LMH),
                                  karr + 1, 0), axis=0).astype(jnp.int32)
        lbot0 = jnp.where(jnp.any(cond & (karr < LMH), 0), lbot0, LMH)
        pbot0 = _lev(p, lbot0)
        # keep base at least PONE above ground
        need_fix = (pbot0 >= pbtmx) | (lbot0 >= LMH)
        alt = jnp.max(jnp.where((p < pbtmx[None]) & (karr < LMH),
                                karr, 0), axis=0).astype(jnp.int32)
        lbot = jnp.where(need_fix, alt, lbot0)
        pbot = _lev(p, lbot)
        return qbt, thbt, psp, apes, thesp, lbot, pbot

    def cape_profile(kb, qbt, thbt, psp, apes, thesp, lbot, pbot):
        """Entropy integral along the parcel path (cu_bmj.f90:718-860).
        Scan from kb upward (decreasing index); early exit when the
        running integral drops below CAPEtrigr."""
        # DTtrigr = -0.0 in the reference, so CAPEtrigr = 0
        capetrigr = jnp.zeros(shape2, t.dtype)
        tup_cloud = _ttblex(p, thesp[None], tables)
        qup_cloud = _qs(tup_cloud, p)
        qwat = qbt[None] - qup_cloud
        tv_env = t * (q * 0.608 + 1.0)
        # term above cloud base (in-cloud, moist adiabat w/ water loading)
        trm_cloud = (tup_cloud * (qup_cloud * 0.608 + 1.0 - qwat)
                     - tv_env) * 0.5 / tv_env
        # term below cloud base (dry parcel)
        tup_dry = thbt[None] / ape
        trm_dry = (tup_dry * (qbt[None] * 0.608 + 1.0) - tv_env) * 0.5 \
            / tv_env

        def body(it, carry):
            cpe, dtv, dentpy, plo, trmlo, alive = carry
            l = kb - 1 - it             # scan upward from below base...
            # three zones: below base (l>lbot), at base (l==lbot),
            # above base (l<lbot)
            lc = jnp.maximum(l, 0)
            pup_mid = _lev(p, lc)
            below = l > lbot
            at_base = l == lbot
            above = l < lbot
            # at cloud base the parcel first rises dry to psp then moist
            # to the level's midpoint (two sub-segments)
            t_lp1 = _lev(t, jnp.minimum(lc + 1, LMH))
            q_lp1 = _lev(q, jnp.minimum(lc + 1, LMH))
            t_l = _lev(t, lc)
            q_l = _lev(q, lc)
            tsp = (t_lp1 - t_l) / jnp.where(plo == pbot, 1.0,
                                            plo - pbot) \
                * (psp - pbot) + t_l
            qsp = (q_lp1 - q_l) / jnp.where(plo == pbot, 1.0,
                                            plo - pbot) \
                * (psp - pbot) + q_l
            tup_b = thbt / apes
            trm_b1 = (tup_b * (qbt * 0.608 + 1.0)
                      - tsp * (qsp * 0.608 + 1.0)) * 0.5 \
                / (tsp * (qsp * 0.608 + 1.0))
            trm_cl = _lev(trm_cloud, lc)
            trm_dr = _lev(trm_dry, lc)

            # segment contributions
            dp_std = plo - pup_mid
            d_below = (trmlo + trm_dr) * dp_std
            # base: dry part (plo -> psp) + moist part (psp -> p(lbot))
            d_base = (trmlo + trm_b1) * (plo - psp) \
                + (trm_b1 + trm_cl) * (psp - pup_mid)
            d_above = (trmlo + trm_cl) * dp_std
            contrib = jnp.where(below, d_below,
                                jnp.where(at_base, d_base, d_above))
            valid = alive & (l >= 0)
            dentpy_new = jnp.where(valid, dentpy + contrib, dentpy)
            p_lb1 = _lev(p, jnp.minimum(lbot + 1, LMH))
            dtv_l = jnp.where(below, trmlo + trm_dr,
                              jnp.where(at_base,
                                        d_base / jnp.where(
                                            p_lb1 == pbot, 1.0,
                                            p_lb1 - pbot),
                                        trm_cl + trmlo))
            cpe = jnp.where((karr == lc[None]) & valid[None],
                            dentpy_new[None], cpe)
            dtv = jnp.where((karr == lc[None]) & valid[None],
                            dtv_l[None], dtv)
            alive = alive & ~(valid & (dentpy_new < capetrigr))
            plo_new = jnp.where(valid,
                                jnp.where(at_base, pup_mid, pup_mid),
                                plo)
            trm_new = jnp.where(valid,
                                jnp.where(below, trm_dr, trm_cl), trmlo)
            return (cpe, dtv, dentpy_new, plo_new, trm_new, alive)

        plo0 = _lev(p, kb)
        carry0 = (zero3, zero3, zero2, plo0, zero2,
                  jnp.ones(shape2, bool))
        cpe, dtv, _, _, _, _ = jax.lax.fori_loop(0, KLEV, body, carry0)
        # cloud top at CAPE maximum, stopping at first cpe < trigger
        def top_scan(it, carry):
            cape, ltp1, flg = carry
            l = kb - it
            lc = jnp.maximum(l, 0)
            cl = _lev(cpe, lc)
            ok = flg & (l >= 0)
            stop = ok & (cl < capetrigr)
            better = ok & ~stop & (cl > cape)
            cape = jnp.where(better, cl, cape)
            ltp1 = jnp.where(better, lc, ltp1)
            flg = flg & ~stop
            return (cape, ltp1, flg)

        cape0 = jnp.zeros(shape2, t.dtype)
        cape, ltp1, _ = jax.lax.fori_loop(
            0, KLEV, top_scan, (cape0, kb, jnp.ones(shape2, bool)))
        ltop = jnp.minimum(ltp1, lbot)
        return cpe, dtv, cape, ltop

    def kb_body(it, carry):
        (capec, pspc, thbtc, lbotc, ltopc, cpec, dtvc, thespc) = carry
        kb = jnp.full(shape2, LMH - it, jnp.int32)
        active = _lev(p, kb) >= pelevfc
        qbt, thbt, psp, apes, thesp, lbot, pbot = parcel_props(kb)
        cpe, dtv, cape, ltop = cape_profile(kb, qbt, thbt, psp, apes,
                                            thesp, lbot, pbot)
        better = active & (cape > capec)
        capec = jnp.where(better, cape, capec)
        pspc = jnp.where(better, psp, pspc)
        thbtc = jnp.where(better, thbt, thbtc)
        thespc = jnp.where(better, thesp, thespc)
        lbotc = jnp.where(better, lbot, lbotc)
        ltopc = jnp.where(better, ltop, ltopc)
        cpec = jnp.where(better[None], cpe, cpec)
        dtvc = jnp.where(better[None], dtv, dtvc)
        return (capec, pspc, thbtc, lbotc, ltopc, cpec, dtvc, thespc)

    lmh_i = jnp.full(shape2, LMH, jnp.int32)
    carry0 = (zero2, zero2, zero2, lmh_i, lmh_i, zero3, zero3, zero2)
    (cape, psp, thbt, lbot, ltop, cpe, dtv, thesp) = jax.lax.fori_loop(
        0, KLEV, kb_body, carry0)

    pbot = _lev(p, lbot)
    ptop = _lev(p, ltop)

    # ---- no-convection exit (cu_bmj.f90:907-917) -----------------------
    no_cnv = (ptop > pbot - PNO) | (ltop > lbot - 2) | (cape <= 0.0)
    cldefi_nc = AVGEFI * sm + STEFI * sm1
    depth = pbot - ptop
    deep = ~no_cnv & (depth >= depmin)
    shallow0 = ~no_cnv & ~deep

    # ======================= DEEP CONVECTION ===========================
    tref = _ttblex(p, thesp[None], tables)
    therk = tref * ape
    efi = cldefi
    stabdl = (efi - EFIMN) * SLOPST + STABDS

    # reference T below freezing level: upward recurrence from lb-1
    # (cu_bmj.f90:996-1016); stops when T(l+1) < TFRZ
    def tref_body(it, carry):
        trefk, trefkx, apekxx, therkx, l0, stopped = carry
        l = LMH - 1 - it
        lc = jnp.maximum(l, 0)
        # seed carry at l = lbot-1
        seed = l == (lbot - 1)
        trefkx = jnp.where(seed, _lev(t, lbot), trefkx)
        apekxx = jnp.where(seed, _lev(ape, lbot), apekxx)
        therkx = jnp.where(seed, _lev(therk, lbot), therkx)
        stopped = jnp.where(seed, jnp.zeros_like(stopped), stopped)
        l0 = jnp.where(seed, lbot, l0)
        in_range = (l <= lbot - 1) & (l >= ltop) & deep
        frz = _row(t, jnp.minimum(lc + 1, LMH)) < TFRZ
        stopped = stopped | (in_range & frz)
        act = in_range & ~stopped
        therky = _row(therk, lc)
        apekxy = _row(ape, lc)
        newv = ((therky - therkx) * stabdl + trefkx * apekxx) / apekxy
        trefk = jnp.where((karr == lc[None]) & act[None], newv[None],
                          trefk)
        trefkx = jnp.where(act, newv, trefkx)
        apekxx = jnp.where(act, apekxy, apekxx)
        therkx = jnp.where(act, therky, therkx)
        l0 = jnp.where(act, lc, l0)
        return (trefk, trefkx, apekxx, therkx, l0, stopped)

    trefk0 = t
    carry0 = (trefk0, zero2, zero2 + 1.0, zero2, lbot,
              jnp.zeros(shape2, bool))
    trefk, _, _, _, l0, _ = jax.lax.fori_loop(0, KLEV, tref_body, carry0)

    # above freezing level: linear-in-p theta-deficit profile
    # (cu_bmj.f90:1023-1031)
    pk0 = _lev(p, l0)
    pkt = ptop
    rdp0t = 1.0 / jnp.where(pk0 == pkt, 1.0, pk0 - pkt)
    dthem = _lev(therk, l0) - _lev(trefk, l0) * _lev(ape, l0)
    above_frz = (karr >= ltop[None]) & (karr < l0[None]) & deep[None]
    trefk = jnp.where(above_frz,
                      (therk - (p - pkt[None]) * dthem[None]
                       * rdp0t[None]) / ape, trefk)

    depwl = pbot - pk0
    depth_frz = PFRZ * psfc * RSFCP

    # cloud-efficiency iteration (cu_bmj.f90:1064-1209)
    in_deep = (karr >= ltop[None]) & (karr <= lbot[None])
    # LQM: lowest level with p <= PQM
    lqm = jnp.max(jnp.where((p <= PQM) & (karr <= lbot[None]), karr, 0),
                  axis=0).astype(jnp.int32)

    def efi_body(itref, carry):
        trefk, qrefk, efi, preck, dentpy, avrgt = carry
        dspbk = ((efi - EFIMN) * SLOPBS + DSPBSS) * sm \
            + ((efi - EFIMN) * SLOPBL + DSPBSL) * sm1
        dsp0k = ((efi - EFIMN) * SLOP0S + DSP0SS) * sm \
            + ((efi - EFIMN) * SLOP0L + DSP0SL) * sm1
        dsptk = ((efi - EFIMN) * SLOPTS + DSPTSS) * sm \
            + ((efi - EFIMN) * SLOPTL + DSPTSL) * sm1
        # saturation-pressure departure profile
        upper = ((pk0[None] - p) * dsptk[None]
                 + (p - pkt[None]) * dsp0k[None]) * rdp0t[None]
        lower = ((pbot[None] - p) * dsp0k[None]
                 + (p - pk0[None]) * dspbk[None]) \
            / jnp.where(pbot == pk0, 1.0, pbot - pk0)[None]
        dsp = jnp.where(depwl[None] >= depth_frz[None],
                        jnp.where(karr < l0[None], upper, lower),
                        jnp.where(karr < l0[None], upper, dsp0k[None]))
        psk = p + dsp
        apesk = (1.0e5 / psk) ** CAPA
        thsk = trefk * ape
        qref_new = PQ0 / psk * jnp.exp(A2 * (thsk - A3 * apesk)
                                       / (thsk - A4 * apesk))
        qrefk = jnp.where(in_deep & (p > PQM), qref_new, q)

        # enthalpy conservation (2 passes, cu_bmj.f90:1118-1157)
        def ec_body(itr, tq):
            trefk, qrefk = tq
            sumde = jnp.sum(jnp.where(in_deep,
                                      ((t - trefk) * CP
                                       + (q - qrefk) * ELWV) * dprs,
                                      0.0), 0)
            dhdt = jnp.sum(jnp.where(
                in_deep,
                (qrefk * A23M4L / ((trefk * ape / apesk) - A4) ** 2
                 + CP) * dprs, 0.0), 0)
            sumdp = jnp.sum(jnp.where(in_deep, dprs, 0.0), 0)
            denom = sumdp - _lev(dprs, ltop)
            denom = jnp.where(denom == 0, 1.0, denom)
            hcorr = sumde / denom
            dhdt = dhdt / denom
            # above LQM: temperature only; below: T and q
            t_only = (karr > ltop[None]) & (karr <= lqm[None])
            t_and_q = (karr > jnp.maximum(ltop, lqm)[None]) \
                & (karr <= lbot[None])
            trefk = jnp.where(t_only, trefk + hcorr[None] * RCP, trefk)
            trefk = jnp.where(t_and_q,
                              trefk + hcorr[None]
                              / jnp.where(dhdt == 0, 1.0, dhdt)[None],
                              trefk)
            thskl = trefk * ape
            qnew = PQ0 / psk * jnp.exp(A2 * (thskl - A3 * apesk)
                                       / (thskl - A4 * apesk))
            qrefk = jnp.where(t_and_q, qnew, qrefk)
            return (trefk, qrefk)

        trefk, qrefk = jax.lax.fori_loop(0, 2, ec_body, (trefk, qrefk))

        # heating / moistening / precipitation (cu_bmj.f90:1163-1196)
        diftl = (trefk - t) * tauk
        difql = (qrefk - q) * tauk
        avrgtl = t + t + diftl
        dpot = dprs / avrgtl
        dst = 2.0 * jnp.sum(jnp.where(in_deep, diftl * dpot, 0.0),
                            0) * CP
        dsq = 2.0 * jnp.sum(jnp.where(in_deep,
                                      difql * ELWV * dpot, 0.0), 0)
        preck = jnp.sum(jnp.where(in_deep, diftl * dprs, 0.0), 0)
        avrgt_sum = jnp.sum(jnp.where(in_deep, avrgtl * dprs, 0.0), 0)
        sumdp = jnp.sum(jnp.where(in_deep, dprs, 0.0), 0)
        avrgt = avrgt_sum / (2.0 * jnp.where(sumdp == 0, 1.0, sumdp))
        dentpy = dst + dsq
        drheat = (preck * sm + jnp.maximum(1e-7, preck) * sm1) * CP \
            / jnp.where(avrgt == 0, 1.0, avrgt)
        drheat = jnp.maximum(drheat, 1e-20)
        efi = jnp.clip(EFIFC * dentpy / drheat, EFIMN, 1.0)
        return (trefk, qrefk, efi, preck, dentpy, avrgt)

    carry0 = (trefk, q, efi, zero2, zero2, zero2 + 1.0)
    trefk_d, qrefk_d, efi, preck, dentpy, _ = jax.lax.fori_loop(
        0, ITREFI_MAX, efi_body, carry0)

    deep_ok = deep & (dentpy >= EPSNTP) & (preck > EPSPR)
    fefi = EFMNT + SLOPE * (efi - EFIMN)
    fefi = (dentpy - EPSNTP) * fefi / jnp.where(dentpy == 0, 1.0,
                                                dentpy)
    preck_eff = preck * fefi
    dtdt_deep = (trefk_d - t) * tauk * fefi[None] * rdtcnvc
    dqdt_deep = (qrefk_d - q) * tauk * fefi[None] * rdtcnvc
    pcp_deep = preck_eff * CPRLG

    # deep failure -> shallow with DTV-based cloud top
    # (cu_bmj.f90:1312-1330)
    def dtv_scan(it, carry):
        ltp1, flg = carry
        l = lbot - 1 - it
        lc = jnp.maximum(l, 0)
        ok = flg & (l >= ltop) & (l >= 0)
        pos = _lev(dtv, lc) > 0.0
        ltp1 = jnp.where(ok & pos, lc, ltp1)
        flg = flg & ~(ok & ~pos)
        return (ltp1, flg)

    ltp1_dtv, _ = jax.lax.fori_loop(0, KLEV, dtv_scan,
                                    (lbot, jnp.ones(shape2, bool)))
    ltop_fail = jnp.minimum(ltp1_dtv, lbot)

    deep_failed = deep & ~deep_ok
    shallow = shallow0 | deep_failed
    ltop_sh = jnp.where(deep_failed, ltop_fail, ltop)
    cldefi_deepfail = EFIMN * sm + STEFI * sm1

    # ====================== SHALLOW CONVECTION =========================
    # (cu_bmj.f90:1379-1726)
    qsatk = _qs(t, p)
    thvref_env = t * ape * (q * 0.608 + 1.0)

    # raise cloud top if avg RH > RHSHmax and CAPE > 0
    tlev2 = _lev(t, lbot) * ((pbot - PONE) / pbot) ** CAPA
    qsat1 = _qs(_lev(t, lbot), pbot)
    qsat2 = PQ0 / (pbot - PONE) * jnp.exp(A2 * (tlev2 - A3)
                                          / (tlev2 - A4))
    rhshmax = qsat2 / qsat1
    rh_w = jnp.where((karr <= lbot[None]) & (karr >= ltop_sh[None]),
                     dprs * q / qsatk, 0.0)
    rhavg0 = jnp.sum(rh_w, 0)
    sumdp0 = jnp.sum(jnp.where((karr <= lbot[None])
                               & (karr >= ltop_sh[None]), dprs, 0.0), 0)
    need_raise = (rhavg0 / jnp.where(sumdp0 == 0, 1.0, sumdp0)) \
        > rhshmax

    def raise_body(it, carry):
        ltsh, rhavg, sumdp, flg = carry
        l = ltop_sh - 1 - it
        lc = jnp.maximum(l, 0)
        ok = flg & (l >= 0) & need_raise & shallow
        rhavg = rhavg + jnp.where(ok, _lev(dprs, lc) * _lev(q, lc)
                                  / _lev(qsatk, lc), 0.0)
        sumdp = sumdp + jnp.where(ok, _lev(dprs, lc), 0.0)
        pos_cpe = _lev(cpe, lc) > 0.0
        ltsh = jnp.where(ok & pos_cpe, lc, ltsh)
        stop = ok & (~pos_cpe
                     | (rhavg / jnp.where(sumdp == 0, 1.0, sumdp)
                        <= rhshmax)
                     | (_lev(p, lc) <= PSHU))
        flg = flg & ~stop
        return (ltsh, rhavg, sumdp, flg)

    ltsh, _, _, _ = jax.lax.fori_loop(
        0, KLEV, raise_body,
        (ltop_sh, rhavg0, sumdp0, jnp.ones(shape2, bool)))
    ltop_sh = jnp.where(need_raise & shallow, ltsh, ltop_sh)
    ltop_sh = jnp.maximum(ltop_sh, 1)        # low-model-top guard
    ptop_sh = _lev(p, ltop_sh)

    sh_ok = shallow & ~((ptop_sh > pbot - PNO) | (ltop_sh > lbot - 2))

    # cloud-top saturation point from PTBL at the level above the top
    ltp1s = jnp.maximum(ltop_sh - 1, 0)
    thtpk = _lev(t, ltp1s) * _lev(ape, ltp1s)
    ptpk = _ptbl_lookup(thtpk, _lev(q, ltp1s), tables)
    dpmix = ptpk - psp
    dpmix = jnp.where(jnp.abs(dpmix) < 3000.0, -3000.0, dpmix)
    smix = (thtpk - thbt) / dpmix * STABS

    # reference T: slope profile from lbot upward (cu_bmj.f90:1537-1553)
    def sh_tref_body(it, carry):
        trefk, trefkx, pkxxxx, pkxxxy, apekxx, apekxy = carry
        l = LMH - it
        lc = jnp.maximum(l, 0)
        seed = l == lbot
        lb1 = jnp.minimum(lbot + 1, LMH)
        trefkx = jnp.where(seed, _lev(t, lb1), trefkx)
        pkxxxx = jnp.where(seed, _lev(p, lb1), pkxxxx)
        pkxxxy = jnp.where(seed, pbot, pkxxxy)
        apekxx = jnp.where(seed, _lev(ape, lb1), apekxx)
        apekxy = jnp.where(seed, _lev(ape, lbot), apekxy)
        act = (l <= lbot) & (l >= ltop_sh) & sh_ok
        newv = ((pkxxxy - pkxxxx) * smix + trefkx * apekxx) / apekxy
        lmid = ((lbot + ltop_sh) // 2)
        newv = jnp.where(l <= lmid,
                         jnp.maximum(newv, _row(t, lc) + DTSHAL), newv)
        trefk = jnp.where((karr == lc) & act[None], newv[None], trefk)
        lm1 = jnp.maximum(lc - 1, 0)
        trefkx = jnp.where(act, newv, trefkx)
        apekxx = jnp.where(act, apekxy, apekxx)
        pkxxxx = jnp.where(act, pkxxxy, pkxxxx)
        apekxy = jnp.where(act, _row(ape, lm1), apekxy)
        pkxxxy = jnp.where(act, _row(p, lm1), pkxxxy)
        return (trefk, trefkx, pkxxxx, pkxxxy, apekxx, apekxy)

    carry0 = (t, zero2, zero2, zero2, zero2 + 1.0, zero2 + 1.0)
    trefk_s, _, _, _, _, _ = jax.lax.fori_loop(0, KLEV + 1,
                                               sh_tref_body, carry0)

    in_sh = (karr >= ltop_sh[None]) & (karr <= lbot[None])
    sumdt = jnp.sum(jnp.where(in_sh, (t - trefk_s) * dprs, 0.0), 0)
    sumdp = jnp.sum(jnp.where(in_sh, dprs, 0.0), 0)
    rdpsum = 1.0 / jnp.where(sumdp == 0, 1.0, sumdp)
    tcorr = sumdt * rdpsum
    trefk_s = jnp.where(in_sh, trefk_s + tcorr[None], trefk_s)
    fpk = trefk_s

    # humidity profile solve (cu_bmj.f90:1572-1640)
    fptk = _lev(fpk, ltop_sh)
    dpkl = fpk - fptk[None]
    rtbar = 2.0 / (trefk_s + t)
    psum = jnp.sum(jnp.where(in_sh, dpkl * dprs, 0.0), 0) * rdpsum
    qsum = jnp.sum(jnp.where(in_sh, q * dprs, 0.0), 0) * rdpsum
    otsum = jnp.sum(jnp.where(in_sh, dprs * rtbar, 0.0), 0)
    rotsum = 1.0 / jnp.where(otsum == 0, 1.0, otsum)
    potsum = jnp.sum(jnp.where(in_sh, dpkl * rtbar * dprs, 0.0),
                     0) * rotsum
    qotsum = jnp.sum(jnp.where(in_sh, q * rtbar * dprs, 0.0),
                     0) * rotsum
    dst = jnp.sum(jnp.where(in_sh,
                            (trefk_s - t) * rtbar * dprs / ELWV, 0.0),
                  0) * rotsum * CP
    sh_ok = sh_ok & (dst <= 0.0)            # positive entropy change
    dstq = dst * EPSDN
    den = potsum - psum
    sh_ok = sh_ok & (-den / jnp.where(psum == 0, 1.0, psum) >= 5e-5)
    dqref = (qotsum - dstq - qsum) / jnp.where(den == 0, 1.0, den)
    sh_ok = sh_ok & (dqref >= 0.0)
    qrftp = qsum - dqref * psum
    qrfkl = (fpk - fptk[None]) * dqref[None] + qrftp[None]

    # cloud moisture sanity limits
    tnew = (trefk_s - t) * tauksc + t
    qsat_new = _qs(tnew, p)
    qnew = (qrfkl - q) * tauksc + q
    bad = in_sh & ((qnew < qsat_new * RHLSC) | (qnew > qsat_new * RHHSC))
    sh_ok = sh_ok & ~jnp.any(bad, 0)
    thvref = trefk_s * ape * (qrfkl * 0.608 + 1.0)
    thvref = jnp.where(in_sh, thvref, thvref_env)
    # impossible slopes (d theta_v / dp must exceed EPSDT)
    th_up = jnp.concatenate([thvref[:1], thvref[:-1]], 0)
    p_up = jnp.concatenate([p[:1], p[:-1]], 0)
    dtdp = (th_up - thvref) / jnp.where(p == p_up, 1.0, p - p_up)
    sh_ok = sh_ok & ~jnp.any(in_sh & (karr > 0) & (dtdp < EPSDT), 0)

    dtdt_sh = (trefk_s - t) * tauksc * rdtcnvc
    dqdt_sh = (qrfkl - q) * tauksc * rdtcnvc

    # ---- combine -------------------------------------------------------
    dtdt = jnp.where(deep_ok[None] & in_deep, dtdt_deep, 0.0)
    dqdt = jnp.where(deep_ok[None] & in_deep, dqdt_deep, 0.0)
    dtdt = jnp.where(sh_ok[None] & in_sh, dtdt_sh, dtdt)
    dqdt = jnp.where(sh_ok[None] & in_sh, dqdt_sh, dqdt)
    pcpcol = jnp.where(deep_ok, jnp.maximum(pcp_deep, 0.0), 0.0)
    cldefi_new = jnp.where(no_cnv, cldefi_nc,
                           jnp.where(deep_ok, efi,
                                     jnp.where(deep_failed,
                                               cldefi_deepfail,
                                               cldefi)))
    return dtdt, dqdt, pcpcol, cldefi_new


def bmj(t, th, qv, p, exner, rho, dz, xland, cldefi, dt, psfc=None):
    """Full BMJ step (BMJDRV, cu_bmj.f90:80-389). Inputs bottom-up
    (z, y, x) with qv a mixing ratio; returns (th_new, qv_new,
    rain_delta_mm, cldefi_new)."""
    tables = get_tables()
    flip = lambda a: a[::-1]
    q_spec = jnp.maximum(EPSQ, qv / (1.0 + qv))
    tcol = flip(t)
    qcol = flip(q_spec)
    pcol = flip(p)
    dpcol = flip(rho * G * dz)
    if psfc is None:
        psfc = p[0] + 0.5 * rho[0] * G * dz[0]
    landmask = xland - 1.0           # BMJ: 1 sea, 0 land
    sm = jnp.clip(landmask, 0.0, 1.0)

    dtdt, dqdt, pcp_m, cldefi_new = _bmj_column(
        dt, sm, cldefi, dpcol, pcol, qcol, tcol, psfc, tables)

    dtdt = flip(dtdt)
    dqdt_mix = flip(dqdt) / (1.0 - flip(qcol)) ** 2
    th_new = th + dtdt * dt / exner
    qv_new = qv + dqdt_mix * dt
    rain_mm = pcp_m * 1000.0
    return th_new, qv_new, rain_mm, cldefi_new
