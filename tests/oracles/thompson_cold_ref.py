"""Independent oracle: literal transcription of the Thompson scheme's
frozen-process core (VERDICT r3 item #4).

Deliberate line-for-line transcription (test-only, like
thompson_warm_ref.py) of /root/reference/src/physics/mp_thompson.f90
restricted to the all-frozen, liquid-free regime: columns with
T < T_0 everywhere, qc = qr = 0 and water-subsaturation (ssatw < 0).
Every liquid-involving process is exactly zero there — cloud/rain
presence flags are false, condensation requires ssatw > eps or cloud,
melting requires T > T_0 — so skipping those blocks reproduces the
reference bit-for-bit for such columns, symmetrically to the warm
oracle's trick.

Covered, in the reference's exact order:
  * column setup + thermodynamic derivations   (mp_thompson.f90:1240-1357)
  * snow moments (Field et al. 2005 fits)      (:1371-1452)
  * graupel intercept/slope (top-down N0_min)  (:1457-1478)
  * temperature/ice table indexes              (:1553-1605)
  * deposition/sublimation prefactor t1_subl   (:1678-1695)
  * Cooper (1986) ice nucleation               (:1817-1826)
  * cloud-ice deposition/sublimation + the
    tpi_ide ice/snow partition                 (:1828-1850)
  * ice -> snow autoconversion via tps/tni_iaus (:1852-1864)
  * snow deposition/sublimation (C_snow interp) (:1866-1884)
  * graupel sublimation                         (:1886-1894)
  * snow collecting cloud ice (Ef_si)           (:1896-1903)
  * vapor-depletion conservation + ice number
    balance + tendencies + temperature          (:2014-2235)
  * TAU+1 update + snow moment/graupel slope
    recompute                                   (:2247-2403)
  * frozen sedimentation (ice, snow, graupel)
    with time splitting + surface accumulation  (:2516-2770)
  * final application                           (:2800-2843)

The three small 2D lookup tables the regime consumes (tps_iaus,
tni_iaus, tpi_ide — the ice autoconversion/deposition-partition
tables) are PASSED IN from the production table builder: this oracle
tests the scheme's process logic and indexing against an independent
transcription; table GENERATION is covered separately
(tests/test_thompson.py::test_tables_sane and the closed-form Cooper
oracle). The big bf16-stored collection/freezing tables are never
consumed in this regime (they require rain), so the storage-precision
divergence documented in physics/mp_thompson._prep_tables does not
enter.

Constants are transcribed from the module header (mp_thompson.f90:
50-200) and thompson_init (:390-640); scheme parameters (av_s, Ef_si,
C_cubes, ...) arrive via the params object (they are namelist inputs in
the reference, mp_thompson.f90:397-412).
"""

import math

import numpy as np

# module constants (mp_thompson.f90:50-200)
PI2 = 3.1415926536
T_0 = 273.15
RHO_NOT = 101325.0 / (287.05 * 298.0)
R1 = 1.0e-12
R2 = 1.0e-6
EPS = 1.0e-15
RV = 461.5
ORV = 1.0 / RV
RR2 = 287.04
CP2 = 1004.0
LSUB = 2.834e6
LVAP0 = 2.5e6
LFUS = LSUB - LVAP0
XM0I = 1.0e-12
D0S = 200.0e-6
ATO = 0.304
HGFR = 235.16
RHO_I = 890.0
AM_I = PI2 * RHO_I / 6.0
BM_I = 3.0
MU_I = 0.0
BV_I = 1.0
BM_S = 2.0
MU_S = 0.6357
KAP0 = 490.6
KAP1 = 17.46
LAM0 = 20.78
LAM1 = 3.29
BM_G = 3.0
MU_G = 0.0
GONV_MIN = 1.0e4
GONV_MAX = 3.0e6
SC = 0.632
C_CUBE = 0.5
NTB_C, NTB_I, NTB_R, NTB_S, NTB_G = 37, 64, 37, 28, 28
NTB_G1, NTB_R1, NTB_I1, NTB_T = 28, 37, 55, 9

# Field et al. (2005) moment-fit coefficients (mp_thompson.f90:271-276)
SA = [5.065339, -0.062659, -3.032362, 0.029469, -0.000285,
      0.31255, 0.000204, 0.003199, 0.0, -0.015952]
SB = [0.476221, -0.015896, 0.165977, 0.007468, -0.000141,
      0.060366, 0.000079, 0.000594, 0.0, -0.003577]

# first lookup-bin entries (thompson_init, :216-258): r_i(1)=1e-10,
# Nt_i(1)=1, r_s(1)=r_g(1)=1e-5 (the snow/graupel bins start at 1e-5,
# NOT 1e-10 — mp_thompson.f90:238-244)
R_I1 = 1.0e-10
NT_I1 = 1.0
R_S1 = 1.0e-5
R_G1 = 1.0e-5
NII2 = -10
NII3 = 0


def _wgamma(y):
    return math.gamma(y)


def _nint(x):
    """Fortran NINT: round half away from zero."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _mantissa_idx(val, base, ntb):
    """The reference's decimal-mantissa binning (goto-141 pattern,
    mp_thompson.f90:1577-1605)."""
    nii = _nint(math.log10(val))
    n = nii
    for nn in (nii - 1, nii, nii + 1):
        if 1.0 <= val / 10.0 ** nn < 10.0:
            n = nn
            break
    idx = int(val / 10.0 ** n) + 10 * (n - base) - (n - base)
    return max(1, min(idx, ntb))


class ColdThompsonOracle:
    """Precomputes init-time coefficients; step() advances one frozen,
    liquid-free column by one dt."""

    def __init__(self, params, tables):
        self.p = params
        # tables: tps_iaus/tni_iaus (ntb_i, ntb_i1), tpi_ide (same dims)
        self.tps_iaus = np.asarray(tables["tps_iaus"], np.float64)
        self.tni_iaus = np.asarray(tables["tni_iaus"], np.float64)
        self.tpi_ide = np.asarray(tables["tpi_ide"], np.float64)

        av_s, bv_s = params.av_s, params.bv_s
        av_g, bv_g = params.av_g, params.bv_g
        am_g = PI2 * params.rho_g / 6.0
        self.am_g = am_g
        self.av_s, self.bv_s, self.fv_s = av_s, bv_s, params.fv_s
        self.av_g, self.bv_g = av_g, bv_g
        self.av_i = params.av_i
        sc3 = SC ** (1.0 / 3.0)

        # ice gammas (thompson_init :445-461)
        cie = [MU_I + 1.0, BM_I + MU_I + 1.0, BM_I + MU_I + BV_I + 1.0,
               MU_I + BV_I + 1.0, MU_I + 2.0,
               BM_I * 0.5 + MU_I + BV_I + 1.0, BM_I * 0.5 + MU_I + 1.0]
        self.cie = cie
        self.cig = [_wgamma(c) for c in cie]
        self.oig1 = 1.0 / self.cig[0]
        self.oig2 = 1.0 / self.cig[1]
        self.obmi = 1.0 / BM_I
        self.D0i = (XM0I / AM_I) ** (1.0 / BM_I)

        # snow exponents (:485-504)
        cse = [BM_S + 1.0, BM_S + 2.0, BM_S * 2.0, BM_S + bv_s + 1.0,
               BM_S * 2.0 + bv_s + 1.0, BM_S * 2.0 + 1.0,
               BM_S + MU_S + 1.0, BM_S + MU_S + 2.0, BM_S + MU_S + 3.0,
               BM_S + MU_S + bv_s + 1.0, BM_S * 2.0 + MU_S + bv_s + 1.0,
               BM_S * 2.0 + MU_S + 1.0, bv_s + 2.0, BM_S + bv_s,
               MU_S + 1.0, 1.0 + (1.0 + bv_s) / 2.0,
               1.0 + (1.0 + bv_s) / 2.0 + MU_S + 1.0, bv_s + MU_S + 3.0]
        self.cse = cse
        self.csg = [_wgamma(c) for c in cse]
        self.oams = 1.0 / params.am_s

        # graupel gammas (thompson_init :510-531)
        cge = [BM_G + 1.0, MU_G + 1.0, BM_G + MU_G + 1.0,
               BM_G * 2.0 + MU_G + 1.0, BM_G * 2.0 + MU_G + bv_g + 1.0,
               BM_G + MU_G + bv_g + 1.0, BM_G + MU_G + bv_g + 2.0,
               BM_G + MU_G + bv_g + 3.0, MU_G + bv_g + 3.0,
               MU_G + 2.0, 0.5 * (bv_g + 5.0 + 2.0 * MU_G),
               0.5 * (bv_g + 5.0) + MU_G]
        self.cge = cge
        self.cge10 = cge[9]           # cge(10) = mu_g + 2
        self.cge11 = cge[10]          # cge(11) = 0.5*(bv_g+5+2*mu_g)
        self.cgg = [_wgamma(c) for c in cge]
        self.ogg1 = 1.0 / self.cgg[0]
        self.ogg2 = 1.0 / self.cgg[1]
        self.ogg3 = 1.0 / self.cgg[2]
        self.obmg = 1.0 / BM_G
        self.oge1 = 1.0 / cge[0]

        # process prefactors (thompson_init :546-564)
        self.t1_qs_qi = PI2 * 0.25 * av_s
        self.t1_qs_sd = 0.86
        self.t2_qs_sd = 0.28 * sc3 * math.sqrt(av_s)
        self.t1_qg_sd = 0.86 * self.cgg[9]
        self.t2_qg_sd = 0.28 * sc3 * math.sqrt(av_g) * self.cgg[10]

    # saturation formulas: Flatau et al. (1992) polynomials
    # (RSLF/RSIF, mp_thompson.f90:3776-3835)
    @staticmethod
    def rslf(p, t):
        C = (0.611583699e3, 0.444606896e2, 0.143177157e1,
             0.264224321e-1, 0.299291081e-3, 0.203154182e-5,
             0.702620698e-8, 0.379534310e-11, -0.321582393e-13)
        x = max(-80.0, t - 273.16)
        esl = C[8]
        for cc in C[7::-1]:
            esl = cc + x * esl
        return 0.622 * esl / (p - esl)

    @staticmethod
    def rsif(p, t):
        C = (0.609868993e3, 0.499320233e2, 0.184672631e1,
             0.402737184e-1, 0.565392987e-3, 0.521693933e-5,
             0.307839583e-7, 0.105785160e-9, 0.161444444e-12)
        x = max(-80.0, t - 273.16)
        esi = C[8]
        for cc in C[7::-1]:
            esi = cc + x * esi
        return 0.622 * esi / (p - esi)

    def _snow_moment(self, tc0, smo2, y):
        """Generic Field et al. moment: a_, b_ for exponent y."""
        loga = (SA[0] + SA[1] * tc0 + SA[2] * y + SA[3] * tc0 * y
                + SA[4] * tc0 * tc0 + SA[5] * y * y
                + SA[6] * tc0 * tc0 * y + SA[7] * tc0 * y * y
                + SA[8] * tc0 * tc0 * tc0 + SA[9] * y * y * y)
        a = 10.0 ** loga
        b = (SB[0] + SB[1] * tc0 + SB[2] * y + SB[3] * tc0 * y
             + SB[4] * tc0 * tc0 + SB[5] * y * y
             + SB[6] * tc0 * tc0 * y + SB[7] * tc0 * y * y
             + SB[8] * tc0 * tc0 * tc0 + SB[9] * y * y * y)
        return a * smo2 ** b

    def step(self, qv1d, qi1d, ni1d, qs1d, qg1d, t1d, p1d, dzq, dt):
        """One microphysics step on a frozen, liquid-free column.
        Arrays are bottom-up (k=0 surface), float64 scalars per level.
        Returns (qv, qi, ni, qs, qg, t, pptice, pptsnow, pptgraul)."""
        p = self.p
        kts, kte = 0, len(qv1d) - 1
        nz = kte + 1
        odt = 1.0 / dt
        odts = odt
        dtsave = dt

        qv1d = np.array(qv1d, np.float64)
        qi1d = np.array(qi1d, np.float64)
        ni1d = np.array(ni1d, np.float64)
        qs1d = np.array(qs1d, np.float64)
        qg1d = np.array(qg1d, np.float64)
        t1d = np.array(t1d, np.float64)
        p1d = np.array(p1d, np.float64)
        dzq = np.array(dzq, np.float64)

        z = np.zeros(nz)
        (pri_inu, pni_inu, pri_ide, pni_ide, prs_ide, prs_iau, pni_iau,
         prs_sci, pni_sci, prs_sde, prg_gde) = (z.copy() for _ in
                                                range(11))
        qvten, qiten, niten, qsten, qgten, tten = (z.copy() for _ in
                                                   range(6))

        # ---- column setup (:1240-1332) -----------------------------
        temp = t1d.copy()
        qv = np.maximum(1e-10, qv1d)
        rho = 0.622 * p1d / (RR2 * temp * (qv + 0.622))
        ri = np.full(nz, R1)
        ni = np.full(nz, R2)
        L_qi = np.zeros(nz, bool)
        rs = np.full(nz, R1)
        L_qs = np.zeros(nz, bool)
        rg = np.full(nz, R1)
        L_qg = np.zeros(nz, bool)
        for k in range(nz):
            assert temp[k] < T_0, "cold oracle requires T < T_0"
            if qi1d[k] > R1:
                ri[k] = qi1d[k] * rho[k]
                ni[k] = max(R2, ni1d[k] * rho[k])
                L_qi[k] = True
                lami = (AM_I * self.cig[1] * self.oig1 * ni[k]
                        / ri[k]) ** self.obmi
                xDi = (BM_I + MU_I + 1.0) / lami
                if xDi < 20e-6:
                    lami = self.cie[1] / 20e-6
                    ni[k] = min(250e3, self.cig[0] * self.oig2 * ri[k]
                                / AM_I * lami ** BM_I)
                elif xDi > 300e-6:
                    lami = self.cie[1] / 300e-6
                    ni[k] = (self.cig[0] * self.oig2 * ri[k] / AM_I
                             * lami ** BM_I)
            else:
                qi1d[k] = 0.0
                ni1d[k] = 0.0
            if qs1d[k] > R1:
                rs[k] = qs1d[k] * rho[k]
                L_qs[k] = True
            else:
                qs1d[k] = 0.0
            if qg1d[k] > R1:
                rg[k] = qg1d[k] * rho[k]
                L_qg[k] = True
            else:
                qg1d[k] = 0.0

        # thermodynamics (:1330-1357)
        tempc_a = temp - 273.15
        rhof = np.sqrt(RHO_NOT / rho)
        rhof2 = np.sqrt(rhof)
        qvs = np.array([self.rslf(p1d[k], temp[k]) for k in range(nz)])
        qvsi = np.array([self.rsif(p1d[k], temp[k]) for k in range(nz)])
        satw = qv / qvs
        sati = qv / qvsi
        ssatw = satw - 1.0
        ssati = sati - 1.0
        ssatw[np.abs(ssatw) < EPS] = 0.0
        ssati[np.abs(ssati) < EPS] = 0.0
        assert (ssatw < EPS).all(), "cold oracle requires ssatw < eps"
        diffu = 2.11e-5 * (temp / 273.15) ** 1.94 * (101325.0 / p1d)
        visco = (1.718 + 0.0049 * tempc_a
                 - 1.2e-5 * tempc_a * tempc_a) * 1e-5
        ocp = 1.0 / (CP2 * (1.0 + 0.887 * qv))
        vsc2 = np.sqrt(rho / visco)
        lvap = LVAP0 + (2106.0 - 4218.0) * tempc_a
        tcond = (5.69 + 0.0168 * tempc_a) * 1e-5 * 418.936

        # ---- snow moments (:1371-1452) -----------------------------
        smob = z.copy()
        smo2 = z.copy()
        smo0 = z.copy()
        smo1 = z.copy()
        smoc = z.copy()
        smoe = z.copy()
        smof = z.copy()
        for k in range(nz):
            if not L_qs[k]:
                continue
            tc0 = min(-0.1, temp[k] - 273.15)
            smob[k] = rs[k] * self.oams
            smo2[k] = smob[k]        # bm_s == 2 exactly
            # 0th moment (:1393-1397)
            loga = SA[0] + SA[1] * tc0 + SA[4] * tc0 * tc0 \
                + SA[8] * tc0 ** 3
            a = 10.0 ** loga
            b = SB[0] + SB[1] * tc0 + SB[4] * tc0 * tc0 \
                + SB[8] * tc0 ** 3
            smo0[k] = a * smo2[k] ** b
            # 1st moment (:1399-1410): y = 1
            smo1[k] = self._snow_moment(tc0, smo2[k], 1.0)
            smoc[k] = self._snow_moment(tc0, smo2[k], self.cse[0])
            smoe[k] = self._snow_moment(tc0, smo2[k], self.cse[12])
            smof[k] = self._snow_moment(tc0, smo2[k], self.cse[15])

        # ---- graupel intercept/slope (:1457-1478) ------------------
        ilamg = z.copy()
        N0_g = z.copy()
        N0_min = GONV_MAX
        for k in range(nz - 1, -1, -1):
            # no rain in this regime -> xslw1 = 0.01 always
            xslw1 = 0.01
            ygra1 = 4.31 + math.log10(max(5e-5, rg[k]))
            zans1 = 3.1 + (100.0 / (300.0 * xslw1 * ygra1
                                    / (10.0 / xslw1 + 1.0
                                       + 0.25 * ygra1)
                                    + 30.0 + 10.0 * ygra1))
            N0_exp = 10.0 ** zans1
            N0_exp = max(GONV_MIN, min(N0_exp, GONV_MAX))
            N0_min = min(N0_exp, N0_min)
            N0_exp = N0_min
            lam_exp = (N0_exp * self.am_g * self.cgg[0]
                       / rg[k]) ** self.oge1
            lamg = lam_exp * (self.cgg[2] * self.ogg2
                              * self.ogg1) ** self.obmg
            ilamg[k] = 1.0 / lamg
            N0_g[k] = N0_exp / (self.cgg[1] * lam_exp) \
                * lamg ** self.cge[1]

        # ---- frozen processes (:1548-2012, liquid blocks zero) -----
        vts_boost = np.full(nz, 1.5)
        for k in range(nz):
            # table indexes (:1553-1605)
            if ri[k] > R_I1:
                idx_i = _mantissa_idx(ri[k], NII2, NTB_I)
            else:
                idx_i = 1
            if ni[k] > NT_I1:
                idx_i1 = _mantissa_idx(ni[k], NII3, NTB_I1)
            else:
                idx_i1 = 1

            # deposition prefactor (:1678-1695)
            otemp = 1.0 / temp[k]
            rvs = rho[k] * qvsi[k]
            rvs_p = rvs * otemp * (LSUB * otemp * ORV - 1.0)
            rvs_pp = rvs * (otemp * (LSUB * otemp * ORV - 1.0)
                            * otemp * (LSUB * otemp * ORV - 1.0)
                            + (-2.0 * LSUB * otemp ** 3 * ORV)
                            + otemp * otemp)
            gamsc = LSUB * diffu[k] / tcond[k] * rvs_p
            alphsc = 0.5 * (gamsc / (1.0 + gamsc)) ** 2 \
                * rvs_pp / rvs_p * rvs / rvs_p
            alphsc = max(1e-9, alphsc)
            xsat = ssati[k]
            if abs(xsat) < 1e-9:
                xsat = 0.0
            t1_subl = 4.0 * PI2 * (1.0 - alphsc * xsat
                                   + 2.0 * alphsc ** 2 * xsat ** 2
                                   - 5.0 * alphsc ** 3 * xsat ** 3) \
                / (1.0 + gamsc)

            vts_boost[k] = 1.0
            rate_max = (qv[k] - qvsi[k]) * rho[k] * odts * 0.999

            # Cooper nucleation (:1817-1826); ssatw < eps here so only
            # the >=25% ice-supersaturation trigger can fire
            if ssati[k] >= 0.25:
                xnc = min(250e3, p.TNO * math.exp(ATO * (T_0 - temp[k])))
                xni = ni[k] + 0.0
                pni_inu[k] = 0.5 * (xnc - xni + abs(xnc - xni)) * odts
                pri_inu[k] = min(rate_max, XM0I * pni_inu[k])
                pni_inu[k] = pri_inu[k] / XM0I

            # cloud ice deposition/sublimation (:1828-1850)
            if L_qi[k]:
                lami = (AM_I * self.cig[1] * self.oig1 * ni[k]
                        / ri[k]) ** self.obmi
                ilami = 1.0 / lami
                xDi = max(self.D0i, (BM_I + MU_I + 1.0) * ilami)
                xmi = AM_I * xDi ** BM_I
                oxmi = 1.0 / xmi
                pri_ide[k] = C_CUBE * t1_subl * diffu[k] * ssati[k] \
                    * rvs * self.oig1 * self.cig[4] * ni[k] * ilami
                if pri_ide[k] < 0.0:
                    pri_ide[k] = max(-ri[k] * odts, pri_ide[k],
                                     rate_max)
                    pni_ide[k] = pri_ide[k] * oxmi
                    pni_ide[k] = max(-ni[k] * odts, pni_ide[k])
                else:
                    pri_ide[k] = min(pri_ide[k], rate_max)
                    tab = self.tpi_ide[idx_i - 1, idx_i1 - 1]
                    prs_ide[k] = (1.0 - tab) * pri_ide[k]
                    pri_ide[k] = tab * pri_ide[k]

                # ice -> snow autoconversion (:1852-1864)
                if idx_i == NTB_I or xDi > 5.0 * D0S:
                    prs_iau[k] = ri[k] * 0.99 * odts
                    pni_iau[k] = ni[k] * 0.95 * odts
                elif xDi < 0.1 * D0S:
                    prs_iau[k] = 0.0
                    pni_iau[k] = 0.0
                else:
                    prs_iau[k] = self.tps_iaus[idx_i - 1,
                                               idx_i1 - 1] * odts
                    prs_iau[k] = min(ri[k] * 0.99 * odts, prs_iau[k])
                    pni_iau[k] = self.tni_iaus[idx_i - 1,
                                               idx_i1 - 1] * odts
                    pni_iau[k] = min(ni[k] * 0.95 * odts, pni_iau[k])

            # snow deposition/sublimation (:1866-1884)
            if L_qs[k]:
                tempc = temp[k] - 273.15
                C_snow = p.C_sqrd + (tempc + 15.0) \
                    * (p.C_cubes - p.C_sqrd) / (-30.0 + 15.0)
                C_snow = max(p.C_sqrd, min(C_snow, p.C_cubes))
                prs_sde[k] = C_snow * t1_subl * diffu[k] * ssati[k] \
                    * rvs * (self.t1_qs_sd * smo1[k]
                             + self.t2_qs_sd * rhof2[k] * vsc2[k]
                             * smof[k])
                if prs_sde[k] < 0.0:
                    prs_sde[k] = max(-rs[k] * odts, prs_sde[k],
                                     rate_max)
                else:
                    prs_sde[k] = min(prs_sde[k], rate_max)

            # graupel sublimation (:1886-1894)
            if L_qg[k] and ssati[k] < -EPS:
                prg_gde[k] = C_CUBE * t1_subl * diffu[k] * ssati[k] \
                    * rvs * N0_g[k] \
                    * (self.t1_qg_sd * ilamg[k] ** self.cge10
                       + self.t2_qg_sd * vsc2[k] * rhof2[k]
                       * ilamg[k] ** self.cge11)
                if prg_gde[k] < 0.0:
                    prg_gde[k] = max(-rg[k] * odts, prg_gde[k],
                                     rate_max)
                else:
                    prg_gde[k] = min(prg_gde[k], rate_max)

            # snow collecting cloud ice (:1896-1903)
            if L_qi[k]:
                lami = (AM_I * self.cig[1] * self.oig1 * ni[k]
                        / ri[k]) ** self.obmi
                ilami = 1.0 / lami
                xDi = max(self.D0i, (BM_I + MU_I + 1.0) * ilami)
                xmi = AM_I * xDi ** BM_I
                oxmi = 1.0 / xmi
                if rs[k] >= R_S1:
                    prs_sci[k] = self.t1_qs_qi * rhof[k] * p.Ef_si \
                        * ri[k] * smoe[k]
                    pni_sci[k] = prs_sci[k] * oxmi

        # ---- conservation (:2014-2110, liquid sums zero) -----------
        for k in range(nz):
            sump = pri_inu[k] + pri_ide[k] + prs_ide[k] \
                + prs_sde[k] + prg_gde[k]
            rate_max = (qv[k] - qvsi[k]) * odts * 0.999
            if (sump > EPS and sump > rate_max) or \
               (sump < -EPS and sump < rate_max):
                ratio = rate_max / sump
                pri_inu[k] *= ratio
                pri_ide[k] *= ratio
                pni_ide[k] *= ratio
                prs_ide[k] *= ratio
                prs_sde[k] *= ratio
                prg_gde[k] *= ratio

            # cloud ice conservation
            sump = pri_ide[k] - prs_iau[k] - prs_sci[k]
            rate_max = -ri[k] * odts
            if sump < rate_max and L_qi[k]:
                ratio = rate_max / sump
                pri_ide[k] *= ratio
                prs_iau[k] *= ratio
                prs_sci[k] *= ratio

            # snow conservation
            sump = prs_sde[k]
            rate_max = -rs[k] * odts
            if sump < rate_max and L_qs[k]:
                ratio = rate_max / sump
                prs_sde[k] *= ratio

            # graupel conservation
            sump = prg_gde[k]
            rate_max = -rg[k] * odts
            if sump < rate_max and L_qg[k]:
                ratio = rate_max / sump
                prg_gde[k] *= ratio

        # ---- tendencies (:2117-2235) -------------------------------
        for k in range(nz):
            orho = 1.0 / rho[k]
            qvten[k] += (-pri_inu[k] - pri_ide[k] - prs_ide[k]
                         - prs_sde[k] - prg_gde[k]) * orho
            qiten[k] += (pri_inu[k] + pri_ide[k]
                         - prs_iau[k] - prs_sci[k]) * orho
            niten[k] += (pni_inu[k] + pni_ide[k]
                         - pni_iau[k] - pni_sci[k]) * orho

            # ice mass/number balance (:2144-2166)
            xri = max(R1, (qi1d[k] + qiten[k] * dtsave) * rho[k])
            xni = max(R2, (ni1d[k] + niten[k] * dtsave) * rho[k])
            if xri > R1:
                lami = (AM_I * self.cig[1] * self.oig1 * xni
                        / xri) ** self.obmi
                xDi = (BM_I + MU_I + 1.0) / lami
                if xDi < 20e-6:
                    lami = self.cie[1] / 20e-6
                    xni = min(250e3, self.cig[0] * self.oig2 * xri
                              / AM_I * lami ** BM_I)
                    niten[k] = (xni - ni1d[k] * rho[k]) * odts * orho
                elif xDi > 300e-6:
                    lami = self.cie[1] / 300e-6
                    xni = self.cig[0] * self.oig2 * xri / AM_I \
                        * lami ** BM_I
                    niten[k] = (xni - ni1d[k] * rho[k]) * odts * orho
            else:
                niten[k] = -ni1d[k] * odts
            xni = max(0.0, (ni1d[k] + niten[k] * dtsave) * rho[k])
            if xni > 250e3:
                niten[k] = (250e3 - ni1d[k] * rho[k]) * odts * orho

            qsten[k] += (prs_iau[k] + prs_sde[k] + prs_sci[k]
                         + prs_ide[k]) * orho
            qgten[k] += prg_gde[k] * orho

            # temperature (:2219-2226, T < T_0 branch, liquid zero)
            tten[k] += (LSUB * ocp[k] * (pri_inu[k] + pri_ide[k]
                                         + prs_ide[k] + prs_sde[k]
                                         + prg_gde[k])) * orho

        # ---- TAU+1 update (:2247-2318) -----------------------------
        for k in range(nz):
            temp[k] = t1d[k] + dt * tten[k]
            qv[k] = max(1e-10, qv1d[k] + dt * qvten[k])
            rho[k] = 0.622 * p1d[k] / (RR2 * temp[k] * (qv[k] + 0.622))
            rhof[k] = math.sqrt(RHO_NOT / rho[k])
            rhof2[k] = math.sqrt(rhof[k])

            if (qi1d[k] + qiten[k] * dt) > R1:
                ri[k] = (qi1d[k] + qiten[k] * dt) * rho[k]
                ni[k] = max(R2, (ni1d[k] + niten[k] * dt) * rho[k])
                L_qi[k] = True
            else:
                ri[k] = R1
                ni[k] = R2
                L_qi[k] = False
            if (qs1d[k] + qsten[k] * dt) > R1:
                rs[k] = (qs1d[k] + qsten[k] * dt) * rho[k]
                L_qs[k] = True
            else:
                rs[k] = R1
                L_qs[k] = False
            if (qg1d[k] + qgten[k] * dt) > R1:
                rg[k] = (qg1d[k] + qgten[k] * dt) * rho[k]
                L_qg[k] = True
            else:
                rg[k] = R1
                L_qg[k] = False

        # snow moment recompute for sedimentation (:2324-2375)
        smod = z.copy()
        for k in range(nz):
            if not L_qs[k]:
                continue
            tc0 = min(-0.1, temp[k] - 273.15)
            smob[k] = rs[k] * self.oams
            smo2[k] = smob[k]
            smoc[k] = self._snow_moment(tc0, smo2[k], self.cse[0])
            smod[k] = self._snow_moment(tc0, smo2[k], self.cse[13])
        # graupel slope recompute (:2378-2395); no rain -> xslw1=0.01
        N0_min = GONV_MAX
        for k in range(nz - 1, -1, -1):
            xslw1 = 0.01
            ygra1 = 4.31 + math.log10(max(5e-5, rg[k]))
            zans1 = 3.1 + (100.0 / (300.0 * xslw1 * ygra1
                                    / (10.0 / xslw1 + 1.0
                                       + 0.25 * ygra1)
                                    + 30.0 + 10.0 * ygra1))
            N0_exp = 10.0 ** zans1
            N0_exp = max(GONV_MIN, min(N0_exp, GONV_MAX))
            N0_min = min(N0_exp, N0_min)
            N0_exp = N0_min
            lam_exp = (N0_exp * self.am_g * self.cgg[0]
                       / rg[k]) ** self.oge1
            lamg = lam_exp * (self.cgg[2] * self.ogg2
                              * self.ogg1) ** self.obmg
            ilamg[k] = 1.0 / lamg

        # ---- frozen sedimentation (:2516-2770) ---------------------
        pptice = pptsnow = pptgraul = 0.0
        vtik = np.zeros(nz + 1)
        vtnik = np.zeros(nz + 1)
        vtsk = np.zeros(nz + 1)
        vtgk = np.zeros(nz + 1)

        # cloud ice terminal velocities + substep count
        nstep = 0
        ksed1 = kts
        for k in range(nz - 1, -1, -1):
            if ri[k] > R1:
                lami = (AM_I * self.cig[1] * self.oig1 * ni[k]
                        / ri[k]) ** self.obmi
                ilami = 1.0 / lami
                vtik[k] = rhof[k] * self.av_i * self.cig[2] \
                    * self.oig2 * ilami ** BV_I
                vtnik[k] = rhof[k] * self.av_i * self.cig[5] \
                    / self.cig[6] * ilami ** BV_I
            else:
                vtik[k] = vtik[k + 1]
                vtnik[k] = vtnik[k + 1]
            if vtik[k] > 1e-3:
                ksed1 = max(ksed1, k)
                delta_tp = dzq[k] / vtik[k]
                nstep = max(nstep, int(dt / delta_tp + 1.0))
        if ksed1 == kte:
            ksed1 = kte - 1
        onstep = 1.0 / nstep if nstep > 0 else 1.0

        nstep_i = int(round(1.0 / onstep))
        for _n in range(nstep_i):
            sed_i = vtik[:nz] * ri
            sed_n = vtnik[:nz] * ni
            k = kte
            odzq = 1.0 / dzq[k]
            orho = 1.0 / rho[k]
            qiten[k] -= sed_i[k] * odzq * onstep * orho
            niten[k] -= sed_n[k] * odzq * onstep * orho
            ri[k] = max(R1, ri[k] - sed_i[k] * odzq * dt * onstep)
            ni[k] = max(R2, ni[k] - sed_n[k] * odzq * dt * onstep)
            for k in range(ksed1, kts - 1, -1):
                odzq = 1.0 / dzq[k]
                orho = 1.0 / rho[k]
                qiten[k] += (sed_i[k + 1] - sed_i[k]) * odzq * onstep \
                    * orho
                niten[k] += (sed_n[k + 1] - sed_n[k]) * odzq * onstep \
                    * orho
                ri[k] = max(R1, ri[k] + (sed_i[k + 1] - sed_i[k])
                            * odzq * dt * onstep)
                ni[k] = max(R2, ni[k] + (sed_n[k + 1] - sed_n[k])
                            * odzq * dt * onstep)
            if ri[kts] > R1 * 10.0:
                pptice += sed_i[kts] * dt * onstep

        # snow terminal velocity + substeps (:2591-2624)
        nstep = 0
        ksed1 = kts
        for k in range(nz - 1, -1, -1):
            if rs[k] > R1:
                xDs = smoc[k] / smob[k]
                Mrat = 1.0 / xDs
                ils1 = 1.0 / (Mrat * LAM0 + self.fv_s)
                ils2 = 1.0 / (Mrat * LAM1 + self.fv_s)
                t1_vts = KAP0 * self.csg[3] * ils1 ** self.cse[3]
                t2_vts = KAP1 * Mrat ** MU_S * self.csg[9] \
                    * ils2 ** self.cse[9]
                ils1 = 1.0 / (Mrat * LAM0)
                ils2 = 1.0 / (Mrat * LAM1)
                t3_vts = KAP0 * self.csg[0] * ils1 ** self.cse[0]
                t4_vts = KAP1 * Mrat ** MU_S * self.csg[6] \
                    * ils2 ** self.cse[6]
                vts = rhof[k] * self.av_s * (t1_vts + t2_vts) \
                    / (t3_vts + t4_vts)
                vtsk[k] = vts * vts_boost[k]
            else:
                vtsk[k] = vtsk[k + 1]
            if vtsk[k] > 1e-3:
                ksed1 = max(ksed1, k)
                delta_tp = dzq[k] / vtsk[k]
                nstep = max(nstep, int(dt / delta_tp + 1.0))
        if ksed1 == kte:
            ksed1 = kte - 1
        onstep = 1.0 / nstep if nstep > 0 else 1.0

        nstep_s = int(round(1.0 / onstep))
        for _n in range(nstep_s):
            sed_s = vtsk[:nz] * rs
            k = kte
            odzq = 1.0 / dzq[k]
            orho = 1.0 / rho[k]
            qsten[k] -= sed_s[k] * odzq * onstep * orho
            rs[k] = max(R1, rs[k] - sed_s[k] * odzq * dt * onstep)
            for k in range(ksed1, kts - 1, -1):
                odzq = 1.0 / dzq[k]
                orho = 1.0 / rho[k]
                qsten[k] += (sed_s[k + 1] - sed_s[k]) * odzq * onstep \
                    * orho
                rs[k] = max(R1, rs[k] + (sed_s[k + 1] - sed_s[k])
                            * odzq * dt * onstep)
            if rs[kts] > R1 * 10.0:
                pptsnow += sed_s[kts] * dt * onstep

        # graupel terminal velocity + substeps (:2628-2652)
        nstep = 0
        ksed1 = kts
        for k in range(nz - 1, -1, -1):
            if rg[k] > R1:
                vtgk[k] = rhof[k] * self.av_g * self.cgg[5] \
                    * self.ogg3 * ilamg[k] ** self.bv_g
            else:
                vtgk[k] = vtgk[k + 1]
            if vtgk[k] > 1e-3:
                ksed1 = max(ksed1, k)
                delta_tp = dzq[k] / vtgk[k]
                nstep = max(nstep, int(dt / delta_tp + 1.0))
        if ksed1 == kte:
            ksed1 = kte - 1
        onstep = 1.0 / nstep if nstep > 0 else 1.0

        nstep_g = int(round(1.0 / onstep))
        for _n in range(nstep_g):
            sed_g = vtgk[:nz] * rg
            k = kte
            odzq = 1.0 / dzq[k]
            orho = 1.0 / rho[k]
            qgten[k] -= sed_g[k] * odzq * onstep * orho
            rg[k] = max(R1, rg[k] - sed_g[k] * odzq * dt * onstep)
            for k in range(ksed1, kts - 1, -1):
                odzq = 1.0 / dzq[k]
                orho = 1.0 / rho[k]
                qgten[k] += (sed_g[k + 1] - sed_g[k]) * odzq * onstep \
                    * orho
                rg[k] = max(R1, rg[k] + (sed_g[k + 1] - sed_g[k])
                            * odzq * dt * onstep)
            if rg[kts] > R1 * 10.0:
                pptgraul += sed_g[kts] * dt * onstep

        # instant melt/freeze (:2774-2795): inactive (T<T_0, no qc)

        # ---- final application (:2800-2843) ------------------------
        for k in range(nz):
            t1d[k] = t1d[k] + tten[k] * dt
            qv1d[k] = max(1e-10, qv1d[k] + qvten[k] * dt)
            qi1d[k] = qi1d[k] + qiten[k] * dt
            ni1d[k] = max(R2 / rho[k], ni1d[k] + niten[k] * dt)
            if qi1d[k] <= R1:
                qi1d[k] = 0.0
                ni1d[k] = 0.0
            else:
                lami = (AM_I * self.cig[1] * self.oig1 * ni1d[k]
                        / qi1d[k]) ** self.obmi
                xDi = (BM_I + MU_I + 1.0) / lami
                if xDi < 20e-6:
                    lami = self.cie[1] / 20e-6
                elif xDi > 300e-6:
                    lami = self.cie[1] / 300e-6
                ni1d[k] = min(self.cig[0] * self.oig2 * qi1d[k]
                              / AM_I * lami ** BM_I, 250e3 / rho[k])
            qs1d[k] = qs1d[k] + qsten[k] * dt
            if qs1d[k] <= R1:
                qs1d[k] = 0.0
            qg1d[k] = qg1d[k] + qgten[k] * dt
            if qg1d[k] <= R1:
                qg1d[k] = 0.0

        return (qv1d, qi1d, ni1d, qs1d, qg1d, t1d,
                pptice, pptsnow, pptgraul)
