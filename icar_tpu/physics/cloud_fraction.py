"""G. Thompson cloud-fraction scheme (icloud=3).

JAX re-implementation of cal_cldfra3 / find_cloudLayers / adjust_cloudIce /
adjust_cloudH2O / adjust_cloudFinal (atm_utilities.f90:727-1146).  The
Fortran walks each column sequentially, detecting contiguous "cloud decks"
(runs of cldfra >= 0.01) and distributing a qvs-difference-bounded water
path over each deck.  Here the per-column walks become vectorized
run-decomposition: two static scans give every level the index of its
run's top and bottom, after which the deck adjustments are closed-form
cumulative sums — no data-dependent loops, everything (nz, ny, nx) at
once.

Used by the RRTMG radiation driver (ra_driver.f90:308-343) to generate
subgrid clouds for the radiation call only; the model's prognostic qc/qi
are not modified (ICAR passes modify_qvapor=.False.).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.indexing import take_level

from .mp_thompson import rsif, rslf

ENTRAINMENT = 0.5   # entrmnt (atm_utilities.f90:744)


def _run_extents(mask):
    """For boolean mask (nz, ...): per-level index of the top and bottom of
    the contiguous True-run containing that level (-1 where False).

    The static python loops over nz unroll into O(nz) selects under jit.
    """
    nz = mask.shape[0]
    minus1 = jnp.full(mask.shape[1:], -1, jnp.int32)

    # scan downward from the top: top_idx[k] = k if run starts here else
    # top_idx[k+1]
    tops = [None] * nz
    tops[nz - 1] = jnp.where(mask[nz - 1], nz - 1, -1).astype(jnp.int32)
    for k in range(nz - 2, -1, -1):
        start = mask[k] & ~mask[k + 1]
        tops[k] = jnp.where(mask[k],
                            jnp.where(start, k, tops[k + 1]), minus1)
    bots = [None] * nz
    bots[0] = jnp.where(mask[0], 0, -1).astype(jnp.int32)
    for k in range(1, nz):
        start = mask[k] & ~mask[k - 1]
        bots[k] = jnp.where(mask[k],
                            jnp.where(start, k, bots[k - 1]), minus1)
    return jnp.stack(tops), jnp.stack(bots)


def _deck_adjust(cfr, q_in, extra, qvs, t, dz, mask, top, bot, t_min):
    """Shared body of adjust_cloudIce/adjust_cloudH2O
    (atm_utilities.f90:1005-1082) for all decks at once.

    q_in is the species being augmented (qi or qc); ``extra`` is the
    additional sink subtracted from the deck water budget (qs for ice,
    zeros for water).  Returns the per-level increment.
    """
    nz = cfr.shape[0]
    dzb3 = jnp.broadcast_to(dz, cfr.shape)
    csum_dz = jnp.cumsum(dzb3, axis=0)          # sum dz[0..k]
    qx = q_in + extra
    csum_q = jnp.cumsum(qx, axis=0)

    topc = jnp.clip(top, 0, nz - 1)
    botc = jnp.clip(bot, 0, nz - 1)
    g = take_level
    # per-level run aggregates (same value for every level of a deck)
    dz_bot = g(dzb3, botc)
    tdz = g(csum_dz, topc) - g(csum_dz, botc) + dz_bot
    # sequential max(1e-6, m - x) fold == closed form since x >= 0
    sum_q = g(csum_q, topc) - g(csum_q, botc) + g(qx, botc)
    max_wc = jnp.abs(g(qvs, topc) - g(qvs, botc))
    max_wc = jnp.maximum(1e-6, max_wc - sum_q)
    max_wc = jnp.minimum(1e-3, max_wc)

    # this_dz(k) = 0.5*dz(bot) + sum_{bot<j<=k} dz(j)
    this_dz = csum_dz - g(csum_dz, botc) + 0.5 * dz_bot
    wc = jnp.maximum(1e-6, max_wc * this_dz / jnp.maximum(tdz, 1e-12)
                     * (1.0 - ENTRAINMENT))
    inc = jnp.where(mask & (cfr > 0.0) & (cfr < 1.0) & (t >= t_min),
                    cfr * cfr * wc, 0.0)
    return inc


def cal_cldfra3(qv, qc, qi, qs, dz, p, t, xland, gridkm, max_relh=1.5):
    """Cloud fraction + subgrid condensate for radiation
    (cal_cldfra3, atm_utilities.f90:727-843; called with
    modify_qvapor=.False., max_relh=1.5 from ra_driver.f90:328).

    All inputs (nz, ny, nx) except xland (ny, nx) and scalar gridkm.
    Returns (cldfra, qc_rad, qi_rad) — qc/qi locally augmented copies for
    the radiation call only.
    """
    nz = qv.shape[0]
    qvsw = rslf(p, t)
    qvsi = rsif(p, t)
    tc = t - 273.15
    qvs = jnp.where(tc >= -12.0, qvsw,
                    jnp.where(tc < -35.0, qvsi,
                              qvsw - (qvsw - qvsi) * (-12.0 - tc) / 23.0))
    rh = jnp.maximum(0.01, qv / qvs)
    rhoa = p / (287.0 * t)

    # first-cut scale-aware cldfra (:774-825)
    delz = jnp.maximum(100.0, dz)
    rh_00l = 0.65 + jnp.sqrt(1.0 / (25.0 + gridkm * gridkm * delz * 0.01))
    rh_00o = 0.81 + jnp.sqrt(1.0 / (50.0 + gridkm * gridkm * delz * 0.01))
    explicit = (qc > 1e-7) | (qi >= 1e-7) | ((qs > 1e-6) & (t < 273.0))
    rh_00 = jnp.where((xland[None] - 1.5) > 0.0, rh_00o, rh_00l)
    rh_00 = jnp.where(tc < -12.0, rh_00l, rh_00)

    # tc >= -12: Sundqvist form against 1.005
    rhum_w = jnp.minimum(rh, 1.0)
    cf_warm = jnp.maximum(0.0, 1.0 - jnp.sqrt(
        jnp.maximum(0.0, (1.005 - rhum_w) / (1.005 - rh_00))))
    # tc < -12: HRRR branch (max_relh=1.5 > 1.12, :806-812)
    rhum_c = jnp.minimum(rh, 1.45)
    rh_00c = jnp.minimum(rh_00 + (1.45 - rh_00) * (-12.0 - tc) / 88.0, 1.45)
    cf_cold = jnp.maximum(0.0, 1.0 - jnp.sqrt(
        jnp.maximum(0.0, (1.5 - rhum_c) / (1.5 - rh_00c))))
    cldfra = jnp.where(tc >= 20.0, 0.0,
                       jnp.where(tc >= -12.0, cf_warm, cf_cold))
    cldfra = jnp.where(cldfra > 0.0,
                       jnp.clip(cldfra, 0.01, 0.9), cldfra)
    cldfra = jnp.where(explicit, 1.0, cldfra)
    # qvs(k) = qv(k) inside explicit cloud feeds the deck budgets (:787)
    qvs = jnp.where(explicit, qv, qvs)

    # --- find_cloudLayers (:846-1001), 0-based indices ------------------
    kk = jnp.arange(nz, dtype=jnp.int32)[:, None, None]
    theta = t * (100000.0 / p) ** (287.05 / 1004.0)

    # highest level warmer than -12C below ~100 hPa (:869-873)
    m12 = (t - 273.16 > -12.0) & (p > 10100.0)
    k_m12c = jnp.max(jnp.where(m12, kk, 0), axis=0)

    # tropopause surrogate: highest k in [0, nz-4] with weak d(theta)/dz
    # (:893-901); no match leaves the Fortran index at kts-1
    th2 = jnp.concatenate([theta[2:], theta[-1:], theta[-1:]], axis=0)
    dz3 = dz + jnp.concatenate([dz[1:], dz[-1:]], axis=0) \
        + jnp.concatenate([dz[2:], dz[-1:], dz[-1:]], axis=0)
    trop = (((th2 - theta) / dz3 < 10.0 / 1500.0) & (p > 8500.0)) \
        | (p > 70000.0)
    trop = trop & (kk < nz - 3)
    k_match = jnp.max(jnp.where(trop, kk, -1), axis=0)
    k_tropo = jnp.clip(k_match + 2, 2, nz - 2)

    # no fractional clouds above the tropopause (:911-915)
    frac = (cldfra > 0.0) & (cldfra < 1.0)
    cldfra = jnp.where(frac & (kk > k_tropo[None]), 0.0, cldfra)

    # LCL-ish base: first stable level above k=2 (:921-928)
    dth = theta - jnp.concatenate([theta[:1], theta[:-1]], axis=0)
    stable = (dth > 0.025e-3 * dz) & (kk >= 2) & (kk <= k_m12c[None])
    first_k = jnp.min(jnp.where(stable, kk, k_m12c[None] + 1), axis=0)
    kbot = jnp.maximum(1, first_k - 2)
    frac = (cldfra > 0.0) & (cldfra < 1.0)
    cldfra = jnp.where(frac & (kk <= kbot[None]), 0.0, cldfra)

    # --- cloud decks (runs of cldfra >= 0.01) ---------------------------
    # ice decks scanned from k_tropo down, bottoms clamped to k_m12C+1,
    # tops must sit at k >= k_m12C+2 to be examined (:936-969)
    base = cldfra >= 0.01
    ice_band = base & (kk >= k_m12c[None] + 1) & (kk <= k_tropo[None])
    itop, ibot = _run_extents(ice_band)
    examined_i = itop >= k_m12c[None] + 2
    multi_i = examined_i & (itop - ibot >= 1)
    single_i = examined_i & (itop == ibot)
    qi_inc = _deck_adjust(cldfra, qi, qs, qvs, t, dz,
                          ice_band & multi_i, itop, ibot, 203.16)
    qi_rad = qi + qi_inc
    qi_rad = jnp.where(ice_band & single_i & frac_between(cldfra),
                       0.05 * qvs, qi_rad)

    # water decks from min(nz-1, k_m12C+2) down to kbot+1 (:973-999)
    wtop_start = jnp.minimum(nz - 1, k_m12c + 2)
    water_band = base & (kk >= kbot[None] + 1) & (kk <= wtop_start[None])
    wtop, wbot = _run_extents(water_band)
    examined_w = wtop > kbot[None]
    multi_w = examined_w & (wtop - wbot >= 1)
    single_w = examined_w & (wtop == wbot)
    qc_inc = _deck_adjust(cldfra, qc, jnp.zeros_like(qc), qvs, t, dz,
                          water_band & multi_w, wtop, wbot, 253.16)
    qc_rad = qc + qc_inc
    qc_rad = jnp.where(water_band & single_w & frac_between(cldfra),
                       0.05 * qvs, qc_rad)

    # --- adjust_cloudFinal: cap the column LWP/IWP added by the scheme
    # at 1.5 mm by scaling fractional-cloud levels (:1089-1146)
    cloudy = cldfra > 0.0
    lwp = jnp.sum(jnp.where(cloudy, qc_rad * rhoa * dz, 0.0), axis=0)
    iwp = jnp.sum(jnp.where(cloudy, qi_rad * rhoa * dz, 0.0), axis=0)
    fracl = (cldfra > 0.0) & (cldfra < 1.0)
    qc_rad = jnp.where(fracl & (lwp[None] > 1.5),
                       qc_rad * (1.5 / jnp.maximum(lwp[None], 1.5)), qc_rad)
    qi_rad = jnp.where(fracl & (iwp[None] > 1.5),
                       qi_rad * (1.5 / jnp.maximum(iwp[None], 1.5)), qi_rad)
    return cldfra, qc_rad, qi_rad


def frac_between(cfr):
    return (cfr > 0.0) & (cfr < 1.0)
