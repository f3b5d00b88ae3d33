"""NoahMP glacier column (vegtype == isice cells under lsm=4).

Re-implementation of MODULE_SF_NOAHMP_GLACIER
(/root/reference/src/physics/lsm_noahmp_glacier.f90) for ICAR's option
set (iopt_gla=1 phase change, BATS albedo, semi-implicit temperature,
Noah TBOT).  Most snow machinery is shared with the main NoahMP module
(the Fortran duplicates it with slightly different thresholds, which the
shared functions take as parameters): new-layer initiation at 0.05 m,
combine minima (0.045, 0.05, 0.2), snowpack-gone threshold 0.05 m, layer-2
split at 0.10 m, glacier-flow cap at 2000 mm.
"""

from __future__ import annotations

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np

from .noahmp import (NSNOW, NSOIL, NSS, MPE, GRAV, SB, VKC, TFRZ, HSUB,
                     HVAP, HFUS, CWAT, CICE, CPAIR, RAIR, DENH2O, DENICE,
                     _stack_j, _active, _snow_mask, _gather_m, _scatter_m,
                     _estg, esat, sfcdif1, csnow, tsnosoi, _thomas_stack,
                     snow_age, snowalb_bats, snowfall_acc, compact_snow,
                     combine_snow, divide_snow, snowh2o)

ALBICE = np.array([0.80, 0.55], np.float32)   # land-ice albedo vis/nir


def thermoprop_glacier(p, isnow, dzsnso, dt, snowh, snice, snliq):
    """Glacier thermal properties: snow from CSNOW, ice below with
    depth-dependent capacity/conductivity (THERMOPROP_GLACIER,
    lsm_noahmp_glacier.f90:537-608)."""
    tksno, cvsno, snicev, snliqv, epore = csnow(isnow, snice, snliq, dzsnso)
    # mid-point depth of each ice layer
    zmid = jnp.cumsum(dzsnso[NSNOW:], axis=0) - 0.5 * dzsnso[NSNOW:]
    hcpct_ice = 1e6 * (0.8194 + 0.1309 * zmid)
    df_ice = 0.32333 + 0.10073 * zmid
    df = jnp.concatenate([tksno, df_ice], axis=0)
    hcpct = jnp.concatenate([cvsno, hcpct_ice], axis=0)
    fact = dt / (jnp.maximum(hcpct, MPE) * jnp.maximum(dzsnso, MPE))
    m0 = NSNOW - 1
    df1_nosnow = ((df[NSNOW] * dzsnso[NSNOW] + 0.35 * snowh)
                  / (snowh + dzsnso[NSNOW]))
    df1_snow = ((df[NSNOW] * dzsnso[NSNOW] + df[m0] * dzsnso[m0])
                / jnp.maximum(dzsnso[m0] + dzsnso[NSNOW], MPE))
    df = df.at[NSNOW].set(jnp.where(isnow == 0, df1_nosnow, df1_snow))
    return df, hcpct, fact


def radiation_glacier(p, dt, tg, sneqvo, sneqv, cosz, qsnow, solad, solai,
                      tauss):
    """Snow/ice albedo mix (RADIATION_GLACIER, :666-754)."""
    tauss, fage = snow_age(p, dt, tg, sneqvo, sneqv, tauss)
    albsnd, albsni = snowalb_bats(p, cosz, fage)
    dark = cosz <= 0.0
    albsnd = jnp.where(dark[None], 0.0, albsnd)
    albsni = jnp.where(dark[None], 0.0, albsni)
    fsno = jnp.where(sneqv > 0.0, 1.0, 0.0)
    albice = jnp.asarray(ALBICE)[:, None, None]
    albsnd = albice * (1.0 - fsno[None]) + albsnd * fsno[None]
    albsni = albice * (1.0 - fsno[None]) + albsni * fsno[None]
    absd = solad * (1.0 - albsnd) + solai * (1.0 - albsni)
    sag = jnp.sum(absd, axis=0)
    fsr = jnp.sum(solad * albsnd + solai * albsni, axis=0)
    return sag, sag, fsr, tauss   # fsa == sag for glacier


def glacier_flux(p, isnow, df, dzsnso, z0m, zlvl, zpd, qair, sfctmp,
                 rhoair, sfcprs, ur, gamma, rsurf, lwdn, rhsur, smc,
                 eair, stc, sag, snowh, lathea, sh2o, cm, ch, tgb, uu,
                 vv):
    """Glacier surface energy balance (GLACIER_FLUX, :904-1119); a
    bare-ground Newton solve with EMG = 0.98 and a freezing cap tied to
    the presence of ice/snow."""
    emg = 0.98
    cir = emg * SB
    mtop = isnow + NSNOW
    stc_top = _gather_m(stc, mtop)
    df_top = _gather_m(df, mtop)
    dz_top = _gather_m(dzsnso, mtop)
    cgh = 2.0 * df_top / dz_top

    st = dict(moz=jnp.zeros_like(tgb), mozsgn=jnp.zeros_like(tgb, jnp.int32),
              fm=jnp.zeros_like(tgb), fh=jnp.zeros_like(tgb),
              fm2=jnp.zeros_like(tgb), fh2=jnp.zeros_like(tgb),
              fv=jnp.full_like(tgb, 0.1))
    h = jnp.zeros_like(tgb)
    z0h = z0m
    qsfc = 0.622 * eair / (sfcprs - 0.378 * eair)
    irb = shb = evb = ghb = jnp.zeros_like(tgb)
    csh = cev = jnp.ones_like(tgb)
    ehb2 = jnp.zeros_like(tgb)
    for it in range(1, 6):
        sd = sfcdif1(st, it, sfctmp, rhoair, h, qair, zlvl, zpd, z0m,
                     z0h, ur)
        for k in ("moz", "mozsgn", "fm", "fh", "fm2", "fh2", "fv"):
            st[k] = sd[k]
        cm, ch = sd["cm"], sd["ch"]
        ehb2 = st["fv"] * VKC / (jnp.log((2.0 + z0h) / z0h) - st["fh2"])
        rahb = jnp.maximum(1.0, 1.0 / (ch * ur))
        rawb = rahb
        estg, destg = _estg(tgb)
        csh = rhoair * CPAIR / rahb
        cev = rhoair * CPAIR / gamma / (rsurf + rawb)
        irb = cir * tgb ** 4 - emg * lwdn
        shb = csh * (tgb - sfctmp)
        evb = cev * (estg * rhsur - eair)
        ghb = cgh * (tgb - stc_top)
        b = sag - irb - shb - evb - ghb
        a = 4.0 * cir * tgb ** 3 + csh + cev * destg + cgh
        dtg = b / a
        irb = irb + 4.0 * cir * tgb ** 3 * dtg
        shb = shb + csh * dtg
        evb = evb + cev * destg * dtg
        ghb = ghb + cgh * dtg
        tgb = tgb + dtg
        h = csh * (tgb - sfctmp)
        estg, _ = _estg(tgb)
        qsfc = 0.622 * (estg * rhsur) / (sfcprs - 0.378 * (estg * rhsur))

    sice = jnp.maximum(smc - sh2o, 0.0)
    cap = ((jnp.max(sice, axis=0) > 0.0) | (snowh > 0.0)) & (tgb > TFRZ)
    tgb = jnp.where(cap, TFRZ, tgb)
    # the reference re-evaluates ESTG over ice at the capped TG (:1035)
    _, estg_i, _, _ = esat(jnp.clip(tgb - TFRZ, -50.0, 50.0))
    qsfc = jnp.where(cap,
                     0.622 * (estg_i * rhsur)
                     / (sfcprs - 0.378 * (estg_i * rhsur)), qsfc)
    irb = jnp.where(cap, cir * tgb ** 4 - emg * lwdn, irb)
    shb = jnp.where(cap, csh * (tgb - sfctmp), shb)
    evb = jnp.where(cap, cev * (estg_i * rhsur - eair), evb)
    ghb = jnp.where(cap, sag - (irb + shb + evb), ghb)

    small = ehb2 < 1e-5
    t2mb = jnp.where(small, tgb,
                     tgb - shb / (rhoair * CPAIR)
                     / jnp.maximum(ehb2, MPE))
    q2b = jnp.where(small, qsfc,
                    qsfc - evb / (lathea * rhoair)
                    * (1.0 / jnp.maximum(ehb2, MPE) + rsurf))
    ehb = 1.0 / jnp.maximum(1.0, 1.0 / (ch * ur))
    return SimpleNamespace(tgb=tgb, cm=cm, ch=ehb, irb=irb, shb=shb,
                           evb=evb, ghb=ghb, t2mb=t2mb, q2b=q2b,
                           qsfc=qsfc, ehb2=ehb2)


def phasechange_glacier(p, isnow, dt, fact, dzsnso, stc, snice, snliq,
                        sneqv, snowh, smc, sh2o):
    """Glacier phase change, OPT_GLA=1 (PHASECHANGE_GLACIER, :1608-1995):
    snow layers like the land version (no supercooling), ice layers with
    inter-layer heat and ice/liquid redistribution passes."""
    act = _active(isnow)
    j_ax = _stack_j()
    is_snow = j_ax <= 0
    qmelt = jnp.zeros_like(sneqv)
    ponding = jnp.zeros_like(sneqv)

    # --- snow layers
    mice_s = snice
    mliq_s = snliq
    wice0 = mice_s
    wmass0 = mice_s + mliq_s
    smask = _snow_mask(isnow)[:NSNOW]
    imelt_s = jnp.zeros_like(snice, jnp.int32)
    imelt_s = jnp.where(smask & (mice_s > 0.0) & (stc[:NSNOW] >= TFRZ),
                        1, imelt_s)
    imelt_s = jnp.where(smask & (mliq_s > 0.0) & (stc[:NSNOW] < TFRZ),
                        2, imelt_s)
    melting = imelt_s > 0
    hm = jnp.where(melting, (stc[:NSNOW] - TFRZ) / fact[:NSNOW], 0.0)
    stc = stc.at[:NSNOW].set(jnp.where(melting, TFRZ, stc[:NSNOW]))
    bad = ((imelt_s == 1) & (hm < 0.0)) | ((imelt_s == 2) & (hm > 0.0))
    hm = jnp.where(bad, 0.0, hm)
    imelt_s = jnp.where(bad, 0, imelt_s)
    xm = hm * dt / HFUS
    do = (imelt_s > 0) & (jnp.abs(hm) > 0.0)
    mice_new = jnp.where(xm > 0.0, jnp.maximum(0.0, wice0 - xm),
                         jnp.where(xm < 0.0,
                                   jnp.minimum(wmass0, wice0 - xm),
                                   mice_s))
    heatr = hm - HFUS * (wice0 - mice_new) / dt
    mliq_new = jnp.maximum(0.0, wmass0 - mice_new)
    stc_s = jnp.where(do & (jnp.abs(heatr) > 0.0),
                      stc[:NSNOW] + fact[:NSNOW] * heatr, stc[:NSNOW])
    stc_s = jnp.where(do & (jnp.abs(heatr) > 0.0)
                      & (mliq_new * mice_new > 0.0), TFRZ, stc_s)
    stc = stc.at[:NSNOW].set(stc_s)
    snice = jnp.where(do, mice_new, mice_s)
    snliq = jnp.where(do, mliq_new, mliq_s)
    qmelt = qmelt + jnp.sum(
        jnp.where(do, jnp.maximum(0.0, wice0 - mice_new), 0.0),
        axis=0) / dt

    # --- ice (soil) layers
    mliq = sh2o * dzsnso[NSNOW:] * 1000.0
    mice = (smc - sh2o) * dzsnso[NSNOW:] * 1000.0
    wice0g = mice
    wmass0g = mice + mliq
    imelt_g = jnp.zeros_like(mice, jnp.int32)
    imelt_g = jnp.where((mice > 0.0) & (stc[NSNOW:] >= TFRZ), 1, imelt_g)
    imelt_g = jnp.where((mliq > 0.0) & (stc[NSNOW:] < TFRZ), 2, imelt_g)
    thin = (isnow == 0) & (sneqv > 0.0)
    imelt_g = imelt_g.at[0].set(jnp.where(thin & (stc[NSNOW] >= TFRZ),
                                          1, imelt_g[0]))
    melting = imelt_g > 0
    hmg = jnp.where(melting, (stc[NSNOW:] - TFRZ) / fact[NSNOW:], 0.0)
    stc = stc.at[NSNOW:].set(jnp.where(melting, TFRZ, stc[NSNOW:]))
    bad = ((imelt_g == 1) & (hmg < 0.0)) | ((imelt_g == 2) & (hmg > 0.0))
    hmg = jnp.where(bad, 0.0, hmg)
    imelt_g = jnp.where(bad, 0, imelt_g)
    xmg = hmg * dt / HFUS

    # layerless snowpack melt over ice (:1745-1766)
    do_thin = thin & (xmg[0] > 0.0)
    temp1 = sneqv
    sneqv_n = jnp.maximum(0.0, temp1 - xmg[0])
    propor = sneqv_n / jnp.maximum(temp1, MPE)
    snowh_n = jnp.maximum(0.0, propor * snowh)
    heatr0 = hmg[0] - HFUS * (temp1 - sneqv_n) / dt
    xm0 = jnp.where(heatr0 > 0.0, heatr0 * dt / HFUS, 0.0)
    hm0 = jnp.where(heatr0 > 0.0, heatr0, 0.0)
    im0 = jnp.where(heatr0 > 0.0, 1, 0)
    qmelt = jnp.where(do_thin,
                      qmelt + jnp.maximum(0.0, temp1 - sneqv_n) / dt,
                      qmelt)
    ponding = jnp.where(do_thin, temp1 - sneqv_n, ponding)
    sneqv = jnp.where(do_thin, sneqv_n, sneqv)
    snowh = jnp.where(do_thin, snowh_n, snowh)
    hmg = hmg.at[0].set(jnp.where(do_thin, hm0, hmg[0]))
    xmg = xmg.at[0].set(jnp.where(do_thin, xm0, xmg[0]))
    imelt_g = imelt_g.at[0].set(jnp.where(do_thin, im0, imelt_g[0]))

    do = (imelt_g > 0) & (jnp.abs(hmg) > 0.0)
    mice_new = jnp.where(xmg > 0.0, jnp.maximum(0.0, wice0g - xmg),
                         jnp.where(xmg < 0.0,
                                   jnp.minimum(wmass0g, wice0g - xmg),
                                   mice))
    heatrg = hmg - HFUS * (wice0g - mice_new) / dt
    mliq_new = jnp.maximum(0.0, wmass0g - mice_new)
    stc_g = jnp.where(do & (jnp.abs(heatrg) > 0.0),
                      stc[NSNOW:] + fact[NSNOW:] * heatrg, stc[NSNOW:])
    stc = stc.at[NSNOW:].set(stc_g)
    mice = jnp.where(do, mice_new, mice)
    mliq = jnp.where(do, mliq_new, mliq)

    # inter-layer heat redistribution (warm layers vs cold layers,
    # :1838-1917), then melt against other layers' ice / refreeze
    # against other layers' liquid (:1918-1993). Static 4x4 loops.
    factg = fact[NSNOW:]
    for _pass, sign in (("warm", 1.0), ("cold", -1.0)):
        mixed = (jnp.max(stc[NSNOW:], axis=0) > TFRZ) \
            & (jnp.min(stc[NSNOW:], axis=0) < TFRZ)
        for j in range(NSOIL):
            if sign > 0:
                active_j = stc[NSNOW + j] > TFRZ
            else:
                active_j = stc[NSNOW + j] < TFRZ
            heat_j = jnp.where(mixed & active_j,
                               (stc[NSNOW + j] - TFRZ) / factg[j], 0.0)
            for k in range(NSOIL):
                if k == j:
                    continue
                if sign > 0:
                    cond = mixed & active_j & (stc[NSNOW + k] < TFRZ) \
                        & (heat_j > 0.1)
                else:
                    cond = mixed & active_j & (stc[NSNOW + k] > TFRZ) \
                        & (heat_j < -0.1)
                heat_k = (stc[NSNOW + k] - TFRZ) / factg[k]
                absorbs = jnp.abs(heat_k) > jnp.abs(heat_j)
                hk_new = jnp.where(absorbs, heat_k + heat_j, 0.0)
                stc = stc.at[NSNOW + k].set(jnp.where(
                    cond, jnp.where(absorbs, TFRZ + hk_new * factg[k],
                                    TFRZ), stc[NSNOW + k]))
                heat_j = jnp.where(cond,
                                   jnp.where(absorbs, 0.0,
                                             heat_j + heat_k), heat_j)
            stc = stc.at[NSNOW + j].set(jnp.where(
                mixed & active_j, TFRZ + heat_j * factg[j],
                stc[NSNOW + j]))

    # warm layers melt other layers' ice
    any_warm = jnp.max(stc[NSNOW:], axis=0) > TFRZ
    any_ice = jnp.max(mice, axis=0) > 0.0
    for j in range(NSOIL):
        active_j = any_warm & any_ice & (stc[NSNOW + j] > TFRZ)
        xm_j = jnp.where(active_j,
                         (stc[NSNOW + j] - TFRZ) / factg[j] * dt / HFUS,
                         0.0)
        for k in range(NSOIL):
            if k == j:
                continue
            cond = active_j & (mice[k] > 0.0) & (xm_j > 0.1)
            absorbs = mice[k] > xm_j
            mice_k = jnp.where(absorbs, mice[k] - xm_j, 0.0)
            stc = stc.at[NSNOW + k].set(jnp.where(cond, TFRZ,
                                                  stc[NSNOW + k]))
            xm_j = jnp.where(cond,
                             jnp.where(absorbs, 0.0, xm_j - mice[k]),
                             xm_j)
            mice = mice.at[k].set(jnp.where(cond, mice_k, mice[k]))
            mliq = mliq.at[k].set(jnp.where(
                cond, jnp.maximum(0.0, wmass0g[k] - mice[k]), mliq[k]))
        stc = stc.at[NSNOW + j].set(jnp.where(
            active_j, TFRZ + xm_j * HFUS / dt * factg[j],
            stc[NSNOW + j]))

    # cold layers refreeze other layers' liquid
    any_cold = jnp.min(stc[NSNOW:], axis=0) < TFRZ
    any_liq = jnp.max(mliq, axis=0) > 0.0
    for j in range(NSOIL):
        active_j = any_cold & any_liq & (stc[NSNOW + j] < TFRZ)
        xm_j = jnp.where(active_j,
                         (stc[NSNOW + j] - TFRZ) / factg[j] * dt / HFUS,
                         0.0)
        for k in range(NSOIL):
            if k == j:
                continue
            cond = active_j & (mliq[k] > 0.0) & (xm_j < -0.1)
            absorbs = mliq[k] > jnp.abs(xm_j)
            mice_k = jnp.where(absorbs, mice[k] - xm_j, mice[k] + mliq[k])
            stc = stc.at[NSNOW + k].set(jnp.where(cond, TFRZ,
                                                  stc[NSNOW + k]))
            xm_j = jnp.where(cond,
                             jnp.where(absorbs, 0.0, xm_j + mliq[k]),
                             xm_j)
            mice = mice.at[k].set(jnp.where(cond, mice_k, mice[k]))
            mliq = mliq.at[k].set(jnp.where(
                cond, jnp.maximum(0.0, wmass0g[k] - mice[k]), mliq[k]))
        stc = stc.at[NSNOW + j].set(jnp.where(
            active_j, TFRZ + xm_j * HFUS / dt * factg[j],
            stc[NSNOW + j]))

    sh2o = mliq / (1000.0 * dzsnso[NSNOW:])
    smc = (mliq + mice) / (1000.0 * dzsnso[NSNOW:])
    imelt = jnp.concatenate([imelt_s, imelt_g], axis=0)
    return stc, snice, snliq, sneqv, snowh, smc, sh2o, qmelt, imelt, ponding


def water_glacier(p, dt, prcp, sfctmp, qvap, qdew, ficeold, zsoil, imelt,
                  isnow, snowh, sneqv, snice, snliq, stc, dzsnso, sh2o,
                  smc, ponding, zsnso, fsh):
    """Glacier water: snowpack + ice replenishment (WATER_GLACIER,
    :1997-2172; OPT_GLA=1)."""
    sice = jnp.maximum(smc - sh2o, 0.0)
    sice_save = sice
    sh2o_save = sh2o

    fpice = jnp.where(
        sfctmp > TFRZ + 2.5, 0.0,
        jnp.where(sfctmp <= TFRZ + 0.5, 1.0,
                  jnp.where(sfctmp <= TFRZ + 2.0,
                            1.0 - (-54.632 + 0.2 * sfctmp), 0.6)))
    bdfall = jnp.minimum(120.0, 67.92 + 51.25
                         * jnp.exp((sfctmp - TFRZ) / 2.59))
    qrain = prcp * (1.0 - fpice)
    qsnow = prcp * fpice
    snowhin = qsnow / bdfall
    qsnsub = qvap
    qsnfro = qdew

    # FSH correction when frost/sublimation bypasses the snowpack
    # (SNOWH2O_GLACIER :2868-2892): applied where there are no layers
    fsh = fsh - jnp.where((sneqv == 0.0) | (isnow == 0),
                          (qsnfro - qsnsub) * HSUB, 0.0)

    dz3 = dzsnso[:NSNOW]
    isnow, snowh, sneqv, dz3, stc, snice, snliq = snowfall_acc(
        p, dt, qsnow, snowhin, sfctmp, isnow, snowh, sneqv, dz3, stc,
        snice, snliq, new_layer_thresh=0.05)
    dz3 = compact_snow(p, dt, stc, snice, snliq, imelt, ficeold, isnow,
                       dz3)
    (isnow, sh2o, sice, stc, snice, snliq, dz3, snowh, sneqv, p1a,
     p2a) = combine_snow(p, isnow, sh2o, sice, stc, snice, snliq, dz3,
                         snowh, sneqv, dzsnso[NSNOW],
                         dzmin_vals=(0.045, 0.05, 0.2),
                         gone_thresh=0.05, glacier=True)
    isnow, stc, snice, snliq, dz3 = divide_snow(
        p, isnow, stc, snice, snliq, dz3, split2_thresh=0.10)
    (isnow, dz3, snowh, sneqv, snice, snliq, sh2o, sice, stc, qsnbot,
     p1b, p2b) = snowh2o(p, dt, qsnfro, qsnsub, qrain, isnow, dz3,
                         snowh, sneqv, snice, snliq, sh2o, sice, stc,
                         dzsnso[NSNOW])
    ponding1 = p1a + p1b
    ponding2 = p2a + p2b

    smask = _snow_mask(isnow)[:NSNOW]
    snice = jnp.where(smask, snice, 0.0)
    snliq = jnp.where(smask, snliq, 0.0)
    stc = stc.at[:NSNOW].set(jnp.where(smask, stc[:NSNOW], 0.0))
    dz3 = jnp.where(smask, dz3, 0.0)
    # glacier flow above 2000 mm (:2239-2246)
    over = sneqv > 2000.0
    m0 = NSNOW - 1
    bdsnow = snice[m0] / jnp.maximum(dz3[m0], MPE)
    flow = jnp.where(over, sneqv - 2000.0, 0.0)
    snice = snice.at[m0].set(jnp.where(over, snice[m0] - flow, snice[m0]))
    dz3 = dz3.at[m0].set(jnp.where(
        over, dz3[m0] - flow / jnp.maximum(bdsnow, MPE), dz3[m0]))
    snoflow = flow / dt
    multi = isnow < 0
    sneqv = jnp.where(multi,
                      jnp.sum(jnp.where(smask, snice + snliq, 0.0),
                              axis=0), sneqv)

    dzsnso = dzsnso.at[:NSNOW].set(dz3)
    act = _active(isnow)
    zsnso = jnp.cumsum(jnp.where(act, dzsnso, 0.0), axis=0)
    top_off = _gather_m(zsnso, isnow + NSNOW) - _gather_m(
        dzsnso, isnow + NSNOW)
    zsnso = -(zsnso - top_off[None])

    runsrf = (ponding + ponding1 + ponding2) / dt
    runsrf = runsrf + jnp.where(isnow == 0, qsnbot + qrain, qsnbot)

    # ice replenishment (OPT_GLA=1, :2149-2158): glacier ice below is
    # bottomless; restore the saved profile and book the difference
    replace = jnp.sum(dzsnso[NSNOW:]
                      * (sice - sice_save + sh2o - sh2o_save), axis=0)
    replace = replace * 1000.0 / dt
    sice = jnp.minimum(1.0, sice_save)
    sh2o = 1.0 - sice
    smc = sice + sh2o
    runsub = snoflow + replace
    return SimpleNamespace(
        isnow=isnow, snowh=snowh, sneqv=sneqv, snice=snice, snliq=snliq,
        stc=stc, zsnso=zsnso, dzsnso=dzsnso, sh2o=sh2o, smc=smc,
        runsrf=runsrf, runsub=runsub, qsnow=qsnow, qsnbot=qsnbot,
        fpice=fpice, fsh=fsh, ponding1=ponding1, ponding2=ponding2)


def glacier_sflx(p, cosz, dt, zsoil, sfctmp, sfcprs, uu, vv, q2, soldn,
                 lwdn, prcp, tbot, ficeold, zlvl, state):
    """One glacier step (NOAHMP_GLACIER, :105-297). ``state`` uses the
    same keys as the main NoahMP state. Returns (outputs, new_state)."""
    s = dict(state)
    isnow = s["isnow"]
    qair = q2   # already specific humidity from the caller

    eair = qair * sfcprs / (0.622 + 0.378 * qair)
    rhoair = (sfcprs - 0.378 * eair) / (RAIR * sfctmp)
    swdown = jnp.where(cosz <= 0.0, 0.0, soldn)
    solad = jnp.stack([swdown * 0.35, swdown * 0.35])
    solai = jnp.stack([swdown * 0.15, swdown * 0.15])

    # layer thickness
    zs_m1 = jnp.concatenate([jnp.zeros_like(s["zsnso"][:1]),
                             s["zsnso"][:-1]], axis=0)
    is_top = _stack_j() == (isnow[None] + 1)
    dzsnso = jnp.where(is_top, -s["zsnso"], zs_m1 - s["zsnso"])
    act = _active(isnow)
    dzsnso = jnp.where(act, dzsnso, 0.0)
    dz_soil_static = jnp.concatenate(
        [-zsoil[:1], -(zsoil[1:] - zsoil[:-1])])[:, None, None]
    dzsnso = dzsnso.at[NSNOW:].set(
        jnp.broadcast_to(dz_soil_static, dzsnso[NSNOW:].shape))

    df, hcpct, fact = thermoprop_glacier(p, isnow, dzsnso, dt,
                                         s["snowh"], s["snice"],
                                         s["snliq"])
    sag, fsa, fsr, tauss = radiation_glacier(
        p, dt, s["tg"], s["sneqvo"], s["sneqv"], cosz, jnp.zeros_like(cosz),
        solad, solai, s["tauss"])

    z0mg = p.z0sno
    zpd = s["snowh"]
    zlvl_g = zpd + zlvl
    lathea = HSUB
    gamma = CPAIR * sfcprs / (0.622 * lathea)
    gf = glacier_flux(p, isnow, df, dzsnso, jnp.full_like(s["tg"], z0mg),
                      zlvl_g, zpd, qair, sfctmp, rhoair, sfcprs,
                      jnp.maximum(jnp.sqrt(uu ** 2 + vv ** 2), 1.0),
                      gamma, jnp.ones_like(s["tg"]), lwdn,
                      jnp.ones_like(s["tg"]), s["smc"], eair, s["stc"],
                      sag, s["snowh"], lathea, s["sh2o"], s["cm"],
                      s["ch"], s["tg"], uu, vv)
    emissi = 0.98
    fire = lwdn + gf.irb
    trad = (jnp.maximum(fire - (1.0 - emissi) * lwdn, 1.0)
            / (emissi * SB)) ** 0.25

    stc = tsnosoi(p, isnow, tbot, s["zsnso"], gf.ghb, df, hcpct, dt,
                  s["snowh"], dzsnso, s["stc"])

    (stc, snice, snliq, sneqv, snowh, smc, sh2o, qmelt, imelt,
     ponding) = phasechange_glacier(p, isnow, dt, fact, dzsnso, stc,
                                    s["snice"], s["snliq"], s["sneqv"],
                                    s["snowh"], s["smc"], s["sh2o"])

    sneqvo = sneqv
    qvap = jnp.maximum(gf.evb / lathea, 0.0)
    qdew = jnp.abs(jnp.minimum(gf.evb / lathea, 0.0))
    edir = qvap - qdew

    w = water_glacier(p, dt, prcp, sfctmp, qvap, qdew, ficeold, zsoil,
                      imelt, isnow, snowh, sneqv, snice, snliq, stc,
                      dzsnso, sh2o, smc, ponding, s["zsnso"], gf.shb)

    snowh, sneqv = w.snowh, w.sneqv
    tiny = (snowh <= 1e-6) | (sneqv <= 1e-3)
    snowh = jnp.where(tiny, 0.0, snowh)
    sneqv = jnp.where(tiny, 0.0, sneqv)
    albedo = jnp.where(swdown > 0.0, fsr / jnp.maximum(swdown, MPE),
                       -999.9)

    new_state = dict(state)
    new_state.update(
        sneqvo=sneqvo, stc=w.stc, sh2o=w.sh2o, smc=w.smc, tg=gf.tgb,
        qsfc=gf.qsfc, isnow=w.isnow, zsnso=w.zsnso, snowh=snowh,
        sneqv=sneqv, snice=w.snice, snliq=w.snliq, cm=gf.cm, ch=gf.ch,
        tauss=tauss)
    outputs = dict(
        fsa=fsa, fsr=fsr, fira=gf.irb, fsh=w.fsh, fgev=gf.evb,
        ssoil=gf.ghb, trad=trad, edir=edir, runsrf=w.runsrf,
        runsub=w.runsub, sag=sag, albedo=albedo, qsnbot=w.qsnbot,
        ponding=ponding, t2m=gf.t2mb, q2e=gf.q2b, q1=gf.qsfc,
        emissi=jnp.full_like(gf.tgb, emissi), fpice=w.fpice,
        qmelt=qmelt)
    return outputs, new_state
