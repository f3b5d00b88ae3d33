"""Independent oracle: literal transcription of the Thompson scheme's
MIXED-PHASE process core (VERDICT r4 missing #2).

Deliberate line-for-line transcription (test-only, like
thompson_warm_ref.py / thompson_cold_ref.py) of
/root/reference/src/physics/mp_thompson.f90 for columns spanning the
melting layer with RAIN and SNOW/GRAUPEL coexisting — the regime the
warm oracle (no ice) and cold oracle (no liquid) both exclude by
construction, and exactly the regime that consumes the big 4D/3D
collection and freezing tables (racs/sacr, racg/gacr, qrfz) that the
production path stores in bfloat16.

Restriction that keeps this transcription exact: columns carry NO cloud
water and NO cloud ice at input (qc = qi = 0), are water-subsaturated
everywhere (ssatw < eps) and below the 25% ice-supersaturation
nucleation trigger. Every cloud-water/cloud-ice process block then
evaluates to exactly zero at TAU-0 (their masks require L_qc/L_qi or
water saturation), while rain<->snow/graupel interactions, freezing,
melting, rain evaporation and all four sedimentations stay fully
active. Cloud ice CREATED by rain freezing during the step flows
through the ice tendency/balance/sedimentation/instant-melt machinery,
which is regime-general and fully transcribed.

Covered, in the reference's exact order:
  * column setup (rain/snow/graupel/ice) + thermodynamics
    incl. delQvs and the qvsi=qvs warm switch    (mp_thompson.f90:1240-1357)
  * snow moments (Field et al. 2005)             (:1371-1452)
  * graupel intercept/slope with the supercooled-
    rain xslw1 dependence                        (:1457-1483)
  * rain y-intercept/slope + self-collection     (:1489-1512)
  * temperature/rain/snow/graupel table indexes  (:1553-1676)
  * deposition/sublimation prefactor t1_subl     (:1678-1695)
  * RAIN COLLECTING SNOW, both temperature
    branches, via the tmr_racs/tcr_sacr/
    tcs_racs/tms_sacr/tnr_* tables               (:1730-1771)
  * RAIN COLLECTING GRAUPEL, both branches, via
    the tmr_racg/tcr_gacr/tcg_racg/tnr_* tables  (:1773-1791)
  * RAIN FREEZING (Bigg 1953) via the tpg/tpi/
    tni/tnr_qrfz tables + the T<HGFR branch      (:1799-1812)
  * snow/graupel deposition-sublimation, cold
    branch (C_snow interp)                       (:1866-1894)
  * MELTING of snow and graupel with collision
    enhancement + warm-side sublimation          (:1953-1999)
  * the dt>120 warm-collection rerouting         (:2003-2007)
  * conservation scalings (vapor/rain/snow/
    graupel) + the Blossey rcg/rcs re-enforcement (:2014-2110)
  * tendencies incl. both temperature branches   (:2117-2235)
  * TAU+1 update + moment/intercept recomputes   (:2247-2403)
  * condensation Newton + rain evaporation       (:2406-2506)
  * sedimentation of rain/ice/snow/graupel with
    the T>0C melting fallspeed floor
    (vts*boost vs vtr, vtg vs vtr)               (:2516-2770)
  * instant melt of (frozen-in-step) cloud ice   (:2774-2795)
  * final application                            (:2797-2843)

The 4D collection tables (racs group: (ntb_s, ntb_t, ntb_r1, ntb_r);
racg group: (ntb_g1, ntb_g, ntb_r1, ntb_r)) and the 3D freezing tables
(qrfz group: (ntb_r, ntb_r1, 45)) are PASSED IN from the production
table builder (physics/thompson_tables.py) in FLOAT32 — this oracle
tests process logic and indexing; table GENERATION is covered by
tests/test_thompson.py. Because the production gather path quantizes
these groups to bfloat16 storage, the oracle accepts pre-quantized
tables too, which is how tests/test_oracles.py measures and bounds the
bf16 storage error in the regime that actually consumes them
(r4 advisory finding #3).

Constants transcribed from the module header (mp_thompson.f90:52-290)
and thompson_init (:390-640); scheme parameters via the params object.
"""

import math

import numpy as np

# module constants (mp_thompson.f90:52-290)
PI2 = 3.1415926536
T_0 = 273.15
RHO_W = 1000.0
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
OLFUS = 1.0 / LFUS
XM0I = 1.0e-12
D0C = 1.0e-6
D0R = 50.0e-6
D0S = 200.0e-6
ATO = 0.304
HGFR = 235.16
RHO_I = 890.0
AM_I = PI2 * RHO_I / 6.0
BM_I = 3.0
MU_I = 0.0
BV_I = 1.0
AV_R = 4854.0
BV_R = 1.0
FV_R = 195.0
AM_R = PI2 * RHO_W / 6.0
BM_R = 3.0
MU_R = 0.0
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
C_SQRD = 0.15
NTB_C, NTB_I, NTB_R, NTB_S, NTB_G = 37, 64, 37, 28, 28
NTB_G1, NTB_R1, NTB_I1, NTB_T = 28, 37, 55, 9

# Field et al. (2005) moment-fit coefficients (mp_thompson.f90:271-276)
SA = [5.065339, -0.062659, -3.032362, 0.029469, -0.000285,
      0.31255, 0.000204, 0.003199, 0.0, -0.015952]
SB = [0.476221, -0.015896, 0.165977, 0.007468, -0.000141,
      0.060366, 0.000079, 0.000594, 0.0, -0.003577]

# first lookup-bin entries + index bases (thompson_init :571-578;
# bin data :216-258): r_r(1)=1e-6, r_s(1)=r_g(1)=1e-5, N0r_exp(1)=1e6,
# N0g_exp(1)=1e4
R_R1 = 1.0e-6
R_S1 = 1.0e-5
R_G1 = 1.0e-5
NIR2 = -6
NIR3 = 6
NIS2 = -5
NIG2 = -5
NIG3 = 4


def _wgamma(y):
    return math.gamma(y)


def _nint(x):
    """Fortran NINT: round half away from zero."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _mantissa_idx(val, base, ntb):
    """The reference's decimal-mantissa binning (goto-14x pattern,
    mp_thompson.f90:1606-1676)."""
    nii = _nint(math.log10(val))
    n = nii
    for nn in (nii - 1, nii, nii + 1):
        if 1.0 <= val / 10.0 ** nn < 10.0:
            n = nn
            break
    idx = int(val / 10.0 ** n) + 10 * (n - base) - (n - base)
    return max(1, min(idx, ntb))


def _fsign(x):
    """Fortran SIGN(1.0, x): +1 for x >= 0 (incl. -0.0), else -1."""
    return 1.0 if x >= 0.0 else -1.0


class MixedThompsonOracle:
    """Precomputes init-time coefficients; step() advances one
    mixed-phase (rain + snow/graupel, no cloud water/ice) column by one
    dt."""

    #: table names this oracle consumes (the bf16-stored groups)
    RACS_NAMES = ("tcs_racs1", "tmr_racs1", "tcs_racs2", "tmr_racs2",
                  "tcr_sacr1", "tms_sacr1", "tcr_sacr2", "tms_sacr2",
                  "tnr_racs1", "tnr_racs2", "tnr_sacr1", "tnr_sacr2")
    RACG_NAMES = ("tmr_racg", "tcr_gacr", "tcg_racg", "tnr_racg",
                  "tnr_gacr")
    QRFZ_NAMES = ("tpg_qrfz", "tpi_qrfz", "tni_qrfz", "tnr_qrfz")

    def __init__(self, params, tables):
        self.p = params
        self.tab = {k: np.asarray(tables[k], np.float64)
                    for k in (self.RACS_NAMES + self.RACG_NAMES
                              + self.QRFZ_NAMES)}
        self.Nt_c = float(getattr(params, "Nt_c", 100.0e6))

        av_s, bv_s = params.av_s, params.bv_s
        av_g, bv_g = params.av_g, params.bv_g
        am_g = PI2 * params.rho_g / 6.0
        self.am_g = am_g
        self.av_s, self.bv_s, self.fv_s = av_s, bv_s, params.fv_s
        self.av_g, self.bv_g = av_g, bv_g
        self.av_i = params.av_i
        sc3 = SC ** (1.0 / 3.0)

        # rain gammas (thompson_init :459-479)
        cre = [BM_R + 1., MU_R + 1., BM_R + MU_R + 1.,
               BM_R * 2. + MU_R + 1., MU_R + BV_R + 1.,
               BM_R + MU_R + BV_R + 1., BM_R * 0.5 + MU_R + BV_R + 1.,
               BM_R + MU_R + BV_R + 3., MU_R + BV_R + 3., MU_R + 2.,
               0.5 * (BV_R + 5. + 2. * MU_R), BM_R * 0.5 + MU_R + 1.,
               BM_R * 2. + MU_R + BV_R + 1.]
        self.cre = cre
        self.crg = [_wgamma(c) for c in cre]
        self.obmr = 1.0 / BM_R
        self.org1 = 1.0 / self.crg[0]
        self.org2 = 1.0 / self.crg[1]
        self.org3 = 1.0 / self.crg[2]

        # ice gammas (:445-461)
        cie = [MU_I + 1.0, BM_I + MU_I + 1.0, BM_I + MU_I + BV_I + 1.0,
               MU_I + BV_I + 1.0, MU_I + 2.0,
               BM_I * 0.5 + MU_I + BV_I + 1.0, BM_I * 0.5 + MU_I + 1.0]
        self.cie = cie
        self.cig = [_wgamma(c) for c in cie]
        self.oig1 = 1.0 / self.cig[0]
        self.oig2 = 1.0 / self.cig[1]
        self.obmi = 1.0 / BM_I

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

        # graupel gammas (:510-531)
        cge = [BM_G + 1.0, MU_G + 1.0, BM_G + MU_G + 1.0,
               BM_G * 2.0 + MU_G + 1.0, BM_G * 2.0 + MU_G + bv_g + 1.0,
               BM_G + MU_G + bv_g + 1.0, BM_G + MU_G + bv_g + 2.0,
               BM_G + MU_G + bv_g + 3.0, MU_G + bv_g + 3.0,
               MU_G + 2.0, 0.5 * (bv_g + 5.0 + 2.0 * MU_G),
               0.5 * (bv_g + 5.0) + MU_G]
        self.cge = cge
        self.cgg = [_wgamma(c) for c in cge]
        self.ogg1 = 1.0 / self.cgg[0]
        self.ogg2 = 1.0 / self.cgg[1]
        self.ogg3 = 1.0 / self.cgg[2]
        self.obmg = 1.0 / BM_G
        self.oge1 = 1.0 / cge[0]

        # process prefactors (thompson_init :538-568)
        self.t1_qr_ev = 0.78 * self.crg[9]
        self.t2_qr_ev = 0.308 * sc3 * math.sqrt(AV_R) * self.crg[10]
        self.t1_qs_sd = 0.86
        self.t2_qs_sd = 0.28 * sc3 * math.sqrt(av_s)
        # C_sqrd is a namelist parameter in the reference (read at
        # :412; the hardcoded module constant is commented out)
        self.t1_qs_me = PI2 * 4.0 * params.C_sqrd * OLFUS * 0.86
        self.t2_qs_me = PI2 * 4.0 * params.C_sqrd * OLFUS * 0.28 * sc3 \
            * math.sqrt(av_s)
        self.t1_qg_sd = 0.86 * self.cgg[9]
        self.t2_qg_sd = 0.28 * sc3 * math.sqrt(av_g) * self.cgg[10]
        self.t1_qg_me = PI2 * 4.0 * C_CUBE * OLFUS * 0.86 * self.cgg[9]
        self.t2_qg_me = PI2 * 4.0 * C_CUBE * OLFUS * 0.28 * sc3 \
            * math.sqrt(av_g) * self.cgg[10]

    # Flatau saturation polynomials (RSLF/RSIF, :3776-3835)
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

    def _rain_balance(self, rr_k, nr_k):
        """lamr/mvd_r with the 2.5mm / 0.75*D0r clamps
        (:1276-1290 and the TAU+1 :2304-2318)."""
        lamr = (AM_R * self.crg[2] * self.org2 * nr_k / rr_k) ** self.obmr
        mvd = (3.0 + MU_R + 0.672) / lamr
        if mvd > 2.5e-3:
            mvd = 2.5e-3
            lamr = (3.0 + MU_R + 0.672) / mvd
            nr_k = self.crg[1] * self.org3 * rr_k * lamr ** BM_R / AM_R
        elif mvd < D0R * 0.75:
            mvd = D0R * 0.75
            lamr = (3.0 + MU_R + 0.672) / mvd
            nr_k = self.crg[1] * self.org3 * rr_k * lamr ** BM_R / AM_R
        return lamr, mvd, nr_k

    def step(self, qv1d, qc1d, qr1d, nr1d, qi1d, ni1d, qs1d, qg1d, t1d,
             p1d, dzq, dt):
        """One microphysics step on a mixed-phase column (bottom-up
        arrays, k=0 = surface). Requires qc = qi = 0 and
        water-subsaturation (asserted). Returns (qv, qc, qr, nr, qi,
        ni, qs, qg, t, pptrain, pptice, pptsnow, pptgraul)."""
        o = self
        p = self.p
        T = self.tab
        kts, kte = 0, len(qv1d) - 1
        nz = kte + 1
        odt = 1.0 / dt
        dtsave = dt
        odts = 1.0 / dtsave

        qv1d = np.array(qv1d, np.float64)
        qc1d = np.array(qc1d, np.float64)
        qr1d = np.array(qr1d, np.float64)
        nr1d = np.array(nr1d, np.float64)
        qi1d = np.array(qi1d, np.float64)
        ni1d = np.array(ni1d, np.float64)
        qs1d = np.array(qs1d, np.float64)
        qg1d = np.array(qg1d, np.float64)
        t1d = np.array(t1d, np.float64)
        p1d = np.array(p1d, np.float64)
        dzq = np.array(dzq, np.float64)
        assert (qc1d == 0.0).all() and (qi1d == 0.0).all(), \
            "mixed oracle regime: no cloud water/ice at input"

        z = np.zeros(nz)
        (prr_rcs, prs_rcs, prg_rcs, pnr_rcs,
         prr_rcg, prg_rcg, pnr_rcg,
         prg_rfz, pri_rfz, pni_rfz, pnr_rfz,
         prs_sde, prg_gde,
         prr_sml, pnr_sml, prr_gml, pnr_gml,
         pnr_rcr, prv_rev, pnr_rev, prw_vcd) = (z.copy()
                                                for _ in range(21))
        qvten, qcten, qrten, nrten, qiten, niten, qsten, qgten, tten = (
            z.copy() for _ in range(9))

        # ---- column setup (:1240-1332) -----------------------------
        temp = t1d.copy()
        qv = np.maximum(1e-10, qv1d)
        pres = p1d.copy()
        rho = 0.622 * pres / (RR2 * temp * (qv + 0.622))
        rc = np.full(nz, R1)
        L_qc = np.zeros(nz, bool)
        ri = np.full(nz, R1)
        ni = np.full(nz, R2)
        L_qi = np.zeros(nz, bool)
        rr = np.full(nz, R1)
        nr = np.full(nz, R2)
        mvd_r = np.zeros(nz)
        L_qr = np.zeros(nz, bool)
        rs = np.full(nz, R1)
        L_qs = np.zeros(nz, bool)
        rg = np.full(nz, R1)
        L_qg = np.zeros(nz, bool)
        for k in range(nz):
            if qr1d[k] > R1:
                rr[k] = qr1d[k] * rho[k]
                nr[k] = max(R2, nr1d[k] * rho[k])
                L_qr[k] = True
                lamr, mvd_r[k], nr[k] = self._rain_balance(rr[k], nr[k])
            else:
                qr1d[k] = 0.0
                nr1d[k] = 0.0
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
        qvs = np.array([o.rslf(pres[k], temp[k]) for k in range(nz)])
        delQvs = np.maximum(0.0, np.array(
            [o.rslf(pres[k], 273.15) for k in range(nz)]) - qv)
        qvsi = np.array([o.rsif(pres[k], temp[k])
                         if tempc_a[k] <= 0.0 else qvs[k]
                         for k in range(nz)])
        satw = qv / qvs
        sati = qv / qvsi
        ssatw = satw - 1.0
        ssati = sati - 1.0
        ssatw[np.abs(ssatw) < EPS] = 0.0
        ssati[np.abs(ssati) < EPS] = 0.0
        assert (ssatw < EPS).all(), "mixed oracle requires ssatw < eps"
        assert (ssati < 0.25).all(), \
            "mixed oracle requires no ice-nucleation trigger"
        diffu = 2.11e-5 * (temp / 273.15) ** 1.94 * (101325.0 / pres)
        visco = np.where(tempc_a >= 0.0,
                         (1.718 + 0.0049 * tempc_a) * 1e-5,
                         (1.718 + 0.0049 * tempc_a
                          - 1.2e-5 * tempc_a * tempc_a) * 1e-5)
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
            smo2[k] = smob[k]          # bm_s == 2 exactly
            loga = SA[0] + SA[1] * tc0 + SA[4] * tc0 * tc0 \
                + SA[8] * tc0 ** 3
            a = 10.0 ** loga
            b = SB[0] + SB[1] * tc0 + SB[4] * tc0 * tc0 \
                + SB[8] * tc0 ** 3
            smo0[k] = a * smo2[k] ** b
            smo1[k] = self._snow_moment(tc0, smo2[k], 1.0)
            smoc[k] = self._snow_moment(tc0, smo2[k], self.cse[0])
            smoe[k] = self._snow_moment(tc0, smo2[k], self.cse[12])
            smof[k] = self._snow_moment(tc0, smo2[k], self.cse[15])

        # ---- graupel intercept/slope (:1457-1483): xslw1 depends on
        # supercooled rain (mvd_r from the setup clamps)
        ilamg = z.copy()
        N0_g = z.copy()
        N0_min = GONV_MAX
        for k in range(nz - 1, -1, -1):
            if temp[k] < 270.65 and L_qr[k] and mvd_r[k] > 100.0e-6:
                xslw1 = 4.01 + math.log10(mvd_r[k])
            else:
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

        # ---- rain y-intercept/slope (:1489-1494) -------------------
        ilamr = z.copy()
        N0_r = z.copy()
        for k in range(nz):
            lamr = (AM_R * o.crg[2] * o.org2 * nr[k] / rr[k]) ** o.obmr
            ilamr[k] = 1.0 / lamr
            mvd_r[k] = (3.0 + MU_R + 0.672) / lamr
            N0_r[k] = nr[k] * o.org2 * lamr ** o.cre[1]

        # ---- warm-rain processes (:1500-1512): self-collection only
        # (cloud blocks require L_qc)
        for k in range(nz):
            if L_qr[k] and mvd_r[k] > D0R:
                Ef_rr = 2.0 - math.exp(2300.0 * (mvd_r[k] - 1600.0e-6))
                pnr_rcr[k] = Ef_rr * 4.0 * nr[k] * rr[k]

        # ---- frozen/mixed processes (:1548-2012) -------------------
        vts_boost = np.full(nz, 1.5)
        for k in range(nz):
            tempc = temp[k] - 273.15
            # temperature table indexes (:1553-1558)
            idx_tc = max(1, min(_nint(-tempc), 45))
            idx_t = int((tempc - 2.5) / 5.0) - 1
            idx_t = max(1, -idx_t)
            idx_t = min(idx_t, NTB_T)
            # rain indexes (:1606-1632)
            if rr[k] > R_R1:
                idx_r = _mantissa_idx(rr[k], NIR2, NTB_R)
                lamr = 1.0 / ilamr[k]
                lam_exp = lamr * (o.crg[2] * o.org2 * o.org1) ** BM_R
                N0_exp = o.org1 * rr[k] / AM_R * lam_exp ** o.cre[0]
                idx_r1 = _mantissa_idx(N0_exp, NIR3, NTB_R1)
            else:
                idx_r = 1
                idx_r1 = NTB_R1
            # snow index (:1634-1648)
            if rs[k] > R_S1:
                idx_s = _mantissa_idx(rs[k], NIS2, NTB_S)
            else:
                idx_s = 1
            # graupel indexes (:1650-1676)
            if rg[k] > R_G1:
                idx_g = _mantissa_idx(rg[k], NIG2, NTB_G)
                lamg = 1.0 / ilamg[k]
                lam_exp = lamg * (self.cgg[2] * self.ogg2
                                  * self.ogg1) ** BM_G
                N0_exp = self.ogg1 * rg[k] / self.am_g \
                    * lam_exp ** self.cge[0]
                idx_g1 = _mantissa_idx(N0_exp, NIG3, NTB_G1)
            else:
                idx_g = 1
                idx_g1 = NTB_G1

            ir, ir1 = idx_r - 1, idx_r1 - 1
            isx, it = idx_s - 1, idx_t - 1
            ig, ig1 = idx_g - 1, idx_g1 - 1

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

            # rain collecting snow (:1730-1771)
            if rr[k] >= R_R1 and rs[k] >= R_S1:
                if temp[k] < T_0:
                    prr_rcs[k] = -(T["tmr_racs2"][isx, it, ir1, ir]
                                   + T["tcr_sacr2"][isx, it, ir1, ir]
                                   + T["tmr_racs1"][isx, it, ir1, ir]
                                   + T["tcr_sacr1"][isx, it, ir1, ir])
                    prs_rcs[k] = (T["tmr_racs2"][isx, it, ir1, ir]
                                  + T["tcr_sacr2"][isx, it, ir1, ir]
                                  - T["tcs_racs1"][isx, it, ir1, ir]
                                  - T["tms_sacr1"][isx, it, ir1, ir])
                    prg_rcs[k] = (T["tmr_racs1"][isx, it, ir1, ir]
                                  + T["tcr_sacr1"][isx, it, ir1, ir]
                                  + T["tcs_racs1"][isx, it, ir1, ir]
                                  + T["tms_sacr1"][isx, it, ir1, ir])
                    prr_rcs[k] = max(-rr[k] * odts, prr_rcs[k])
                    prs_rcs[k] = max(-rs[k] * odts, prs_rcs[k])
                    prg_rcs[k] = min((rr[k] + rs[k]) * odts, prg_rcs[k])
                    pnr_rcs[k] = (T["tnr_racs1"][isx, it, ir1, ir]
                                  + T["tnr_racs2"][isx, it, ir1, ir]
                                  + T["tnr_sacr1"][isx, it, ir1, ir]
                                  + T["tnr_sacr2"][isx, it, ir1, ir])
                else:
                    prs_rcs[k] = (-T["tcs_racs1"][isx, it, ir1, ir]
                                  - T["tms_sacr1"][isx, it, ir1, ir]
                                  + T["tmr_racs2"][isx, it, ir1, ir]
                                  + T["tcr_sacr2"][isx, it, ir1, ir])
                    prs_rcs[k] = max(-rs[k] * odts, prs_rcs[k])
                    prr_rcs[k] = -prs_rcs[k]
                    pnr_rcs[k] = (T["tnr_racs2"][isx, it, ir1, ir]
                                  + T["tnr_sacr2"][isx, it, ir1, ir])
                pnr_rcs[k] = min(nr[k] * odts, pnr_rcs[k])

            # rain collecting graupel (:1773-1791)
            if rr[k] >= R_R1 and rg[k] >= R_G1:
                if temp[k] < T_0:
                    prg_rcg[k] = T["tmr_racg"][ig1, ig, ir1, ir] \
                        + T["tcr_gacr"][ig1, ig, ir1, ir]
                    prg_rcg[k] = min(rr[k] * odts, prg_rcg[k])
                    prr_rcg[k] = -prg_rcg[k]
                    pnr_rcg[k] = T["tnr_racg"][ig1, ig, ir1, ir] \
                        + T["tnr_gacr"][ig1, ig, ir1, ir]
                    pnr_rcg[k] = min(nr[k] * odts, pnr_rcg[k])
                else:
                    prr_rcg[k] = T["tcg_racg"][ig1, ig, ir1, ir]
                    prr_rcg[k] = min(rg[k] * odts, prr_rcg[k])
                    prg_rcg[k] = -prr_rcg[k]

            if temp[k] < T_0:
                vts_boost[k] = 1.0
                rate_max = (qv[k] - qvsi[k]) * rho[k] * odts * 0.999

                # rain freezing (Bigg 1953; :1799-1812)
                if rr[k] > R_R1:
                    prg_rfz[k] = T["tpg_qrfz"][ir, ir1, idx_tc - 1] \
                        * odts
                    pri_rfz[k] = T["tpi_qrfz"][ir, ir1, idx_tc - 1] \
                        * odts
                    pni_rfz[k] = T["tni_qrfz"][ir, ir1, idx_tc - 1] \
                        * odts
                    pnr_rfz[k] = T["tnr_qrfz"][ir, ir1, idx_tc - 1] \
                        * odts
                    pnr_rfz[k] = min(nr[k] * odts, pnr_rfz[k])
                elif rr[k] > R1 and temp[k] < HGFR:
                    pri_rfz[k] = rr[k] * odts
                    pnr_rfz[k] = nr[k] * odts
                    pni_rfz[k] = pnr_rfz[k]

                # (cloud-water freezing, nucleation, ice dep, iaus, sci,
                # rci, ihm, riming-conversion all zero: L_qc = L_qi =
                # False and the nucleation trigger is excluded)

                # snow deposition/sublimation, cold branch (:1866-1884)
                if L_qs[k]:
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
                        * (self.t1_qg_sd * ilamg[k] ** self.cge[9]
                           + self.t2_qg_sd * vsc2[k] * rhof2[k]
                           * ilamg[k] ** self.cge[10])
                    if prg_gde[k] < 0.0:
                        prg_gde[k] = max(-rg[k] * odts, prg_gde[k],
                                         rate_max)
                    else:
                        prg_gde[k] = min(prg_gde[k], rate_max)

            else:
                # melt snow/graupel + warm-side sublimation (:1953-1999)
                if L_qs[k]:
                    prr_sml[k] = (tempc * tcond[k]
                                  - LVAP0 * diffu[k] * delQvs[k]) \
                        * (self.t1_qs_me * smo1[k]
                           + self.t2_qs_me * rhof2[k] * vsc2[k]
                           * smof[k])
                    prr_sml[k] = prr_sml[k] + 4218.0 * OLFUS * tempc \
                        * (prr_rcs[k] + 0.0)        # prs_scw = 0
                    prr_sml[k] = min(rs[k] * odts,
                                     max(0.0, prr_sml[k]))
                    pnr_sml[k] = smo0[k] / rs[k] * prr_sml[k] \
                        * 10.0 ** (-0.75 * tempc)
                    pnr_sml[k] = min(smo0[k] * odts, pnr_sml[k])
                    if tempc > 3.5 or rs[k] < 0.005e-3:
                        pnr_sml[k] = 0.0

                    if ssati[k] < 0.0:
                        prs_sde[k] = p.C_cubes * t1_subl * diffu[k] \
                            * ssati[k] * rvs \
                            * (self.t1_qs_sd * smo1[k]
                               + self.t2_qs_sd * rhof2[k] * vsc2[k]
                               * smof[k])
                        prs_sde[k] = max(-rs[k] * odts, prs_sde[k])

                if L_qg[k]:
                    prr_gml[k] = (tempc * tcond[k]
                                  - LVAP0 * diffu[k] * delQvs[k]) \
                        * N0_g[k] * (self.t1_qg_me
                                     * ilamg[k] ** self.cge[9]
                                     + self.t2_qg_me * rhof2[k]
                                     * vsc2[k]
                                     * ilamg[k] ** self.cge[10])
                    prr_gml[k] = min(rg[k] * odts,
                                     max(0.0, prr_gml[k]))
                    pnr_gml[k] = N0_g[k] * self.cgg[1] \
                        * ilamg[k] ** self.cge[1] / rg[k] \
                        * prr_gml[k] * 10.0 ** (-1.5 * tempc)
                    if tempc > 7.5 or rg[k] < 0.005e-3:
                        pnr_gml[k] = 0.0

                    if ssati[k] < 0.0:
                        prg_gde[k] = C_CUBE * t1_subl * diffu[k] \
                            * ssati[k] * rvs * N0_g[k] \
                            * (self.t1_qg_sd * ilamg[k] ** self.cge[9]
                               + self.t2_qg_sd * vsc2[k] * rhof2[k]
                               * ilamg[k] ** self.cge[10])
                        prg_gde[k] = max(-rg[k] * odts, prg_gde[k])

                # dt > 120 warm-collection rerouting (:2003-2007):
                # prs_scw = prg_gcw = 0 in this regime -> no-op

        # ---- conservation (:2014-2110) -----------------------------
        for k in range(nz):
            # vapor depletion (deposition terms only)
            sump = prs_sde[k] + prg_gde[k]
            rate_max = (qv[k] - qvsi[k]) * odts * 0.999
            if (sump > EPS and sump > rate_max) or \
               (sump < -EPS and sump < rate_max):
                ratio = rate_max / sump
                prs_sde[k] *= ratio
                prg_gde[k] *= ratio

            # (cloud water / cloud ice conservation: all terms zero)

            # rain conservation
            sump = -prg_rfz[k] - pri_rfz[k] + prr_rcs[k] + prr_rcg[k]
            rate_max = -rr[k] * odts
            if sump < rate_max and L_qr[k]:
                ratio = rate_max / sump
                prg_rfz[k] *= ratio
                pri_rfz[k] *= ratio
                prr_rcs[k] *= ratio
                prr_rcg[k] *= ratio

            # snow conservation
            sump = prs_sde[k] - prr_sml[k] + prs_rcs[k]
            rate_max = -rs[k] * odts
            if sump < rate_max and L_qs[k]:
                ratio = rate_max / sump
                prs_sde[k] *= ratio
                prr_sml[k] *= ratio
                prs_rcs[k] *= ratio

            # graupel conservation
            sump = prg_gde[k] - prr_gml[k] + prg_rcg[k]
            rate_max = -rg[k] * odts
            if sump < rate_max and L_qg[k]:
                ratio = rate_max / sump
                prg_gde[k] *= ratio
                prr_gml[k] *= ratio
                prg_rcg[k] *= ratio

            # Blossey re-enforcement (:2098-2108)
            ratio = min(abs(prr_rcg[k]), abs(prg_rcg[k]))
            prr_rcg[k] = ratio * _fsign(prr_rcg[k])
            prg_rcg[k] = -prr_rcg[k]
            if temp[k] > T_0:
                ratio = min(abs(prr_rcs[k]), abs(prs_rcs[k]))
                prr_rcs[k] = ratio * _fsign(prr_rcs[k])
                prs_rcs[k] = -prr_rcs[k]

        # ---- tendencies (:2117-2235) -------------------------------
        lfus2_arr = LSUB - lvap
        for k in range(nz):
            orho = 1.0 / rho[k]
            lfus2 = lfus2_arr[k]
            qvten[k] += (-prs_sde[k] - prg_gde[k]) * orho
            # qcten: all terms zero
            qiten[k] += (pri_rfz[k]) * orho
            niten[k] += (pni_rfz[k]) * orho

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

            # rain tendency + number (:2168-2207)
            qrten[k] += (prr_sml[k] + prr_gml[k] + prr_rcs[k]
                         + prr_rcg[k] - prg_rfz[k] - pri_rfz[k]) * orho
            nrten[k] += (pnr_sml[k] + pnr_gml[k]
                         - (pnr_rfz[k] + pnr_rcr[k] + pnr_rcg[k]
                            + pnr_rcs[k])) * orho
            xrr = max(R1, (qr1d[k] + qrten[k] * dtsave) * rho[k])
            xnr = max(R2, (nr1d[k] + nrten[k] * dtsave) * rho[k])
            if xrr > R1:
                lamr = (AM_R * o.crg[2] * o.org2 * xnr / xrr) ** o.obmr
                mvd_r[k] = (3.0 + MU_R + 0.672) / lamr
                if mvd_r[k] > 2.5e-3:
                    mvd_r[k] = 2.5e-3
                    lamr = (3.0 + MU_R + 0.672) / mvd_r[k]
                    xnr = o.crg[1] * o.org3 * xrr * lamr ** BM_R / AM_R
                    nrten[k] = (xnr - nr1d[k] * rho[k]) * odts * orho
                elif mvd_r[k] < D0R * 0.75:
                    mvd_r[k] = D0R * 0.75
                    lamr = (3.0 + MU_R + 0.672) / mvd_r[k]
                    xnr = o.crg[1] * o.org3 * xrr * lamr ** BM_R / AM_R
                    nrten[k] = (xnr - nr1d[k] * rho[k]) * odts * orho
            else:
                qrten[k] = -qr1d[k] * odts
                nrten[k] = -nr1d[k] * odts

            qsten[k] += (prs_sde[k] + prs_rcs[k] - prr_sml[k]) * orho
            qgten[k] += (prg_rfz[k] + prg_gde[k] + prg_rcg[k]
                         + prg_rcs[k] - prr_gml[k]) * orho

            # temperature tendency (:2216-2233)
            if temp[k] < T_0:
                tten[k] += (LSUB * ocp[k] * (prs_sde[k] + prg_gde[k])
                            + lfus2 * ocp[k] * (pri_rfz[k] + prg_rfz[k]
                                                + prg_rcs[k]
                                                + prs_rcs[k]
                                                + prg_rcg[k])) * orho
            else:
                tten[k] += (LFUS * ocp[k] * (-prr_sml[k] - prr_gml[k]
                                             - prr_rcg[k]
                                             - prr_rcs[k])
                            + LSUB * ocp[k] * (prs_sde[k]
                                               + prg_gde[k])) * orho

        # ---- TAU+1 update (:2247-2318) -----------------------------
        lvt2 = np.empty(nz)
        for k in range(nz):
            temp[k] = t1d[k] + dt * tten[k]
            otemp = 1.0 / temp[k]
            tempc_k = temp[k] - 273.15
            qv[k] = max(1e-10, qv1d[k] + dt * qvten[k])
            rho[k] = 0.622 * pres[k] / (RR2 * temp[k] * (qv[k] + 0.622))
            rhof[k] = math.sqrt(RHO_NOT / rho[k])
            rhof2[k] = math.sqrt(rhof[k])
            qvs[k] = o.rslf(pres[k], temp[k])
            ssatw[k] = qv[k] / qvs[k] - 1.0
            if abs(ssatw[k]) < EPS:
                ssatw[k] = 0.0
            diffu[k] = (2.11e-5 * (temp[k] / 273.15) ** 1.94
                        * (101325.0 / pres[k]))
            if tempc_k >= 0.0:
                visco[k] = (1.718 + 0.0049 * tempc_k) * 1.0e-5
            else:
                visco[k] = (1.718 + 0.0049 * tempc_k
                            - 1.2e-5 * tempc_k * tempc_k) * 1.0e-5
            vsc2[k] = math.sqrt(rho[k] / visco[k])
            lvap[k] = LVAP0 + (2106.0 - 4218.0) * tempc_k
            tcond[k] = (5.69 + 0.0168 * tempc_k) * 1.0e-5 * 418.936
            ocp[k] = 1.0 / (CP2 * (1.0 + 0.887 * qv[k]))
            lvt2[k] = lvap[k] * lvap[k] * ocp[k] * ORV * otemp * otemp

            if (qc1d[k] + qcten[k] * dt) > R1:
                rc[k] = (qc1d[k] + qcten[k] * dt) * rho[k]
                L_qc[k] = True
            else:
                rc[k] = R1
                L_qc[k] = False
            if (qi1d[k] + qiten[k] * dt) > R1:
                ri[k] = (qi1d[k] + qiten[k] * dt) * rho[k]
                ni[k] = max(R2, (ni1d[k] + niten[k] * dt) * rho[k])
                L_qi[k] = True
            else:
                ri[k] = R1
                ni[k] = R2
                L_qi[k] = False
            if (qr1d[k] + qrten[k] * dt) > R1:
                rr[k] = (qr1d[k] + qrten[k] * dt) * rho[k]
                nr[k] = max(R2, (nr1d[k] + nrten[k] * dt) * rho[k])
                L_qr[k] = True
                lamr, mvd_r[k], nr[k] = self._rain_balance(rr[k], nr[k])
            else:
                rr[k] = R1
                nr[k] = R2
                L_qr[k] = False
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

        # snow moment recompute (:2324-2375)
        smod = z.copy()
        for k in range(nz):
            if not L_qs[k]:
                continue
            tc0 = min(-0.1, temp[k] - 273.15)
            smob[k] = rs[k] * self.oams
            smo2[k] = smob[k]
            smoc[k] = self._snow_moment(tc0, smo2[k], self.cse[0])
            smod[k] = self._snow_moment(tc0, smo2[k], self.cse[13])
        # graupel intercept/slope recompute with the TAU+1 rain
        # (:2378-2395)
        self._dbg_xslw1 = np.zeros(nz)
        N0_min = GONV_MAX
        for k in range(nz - 1, -1, -1):
            if temp[k] < 270.65 and L_qr[k] and mvd_r[k] > 100.0e-6:
                xslw1 = 4.01 + math.log10(mvd_r[k])
            else:
                xslw1 = 0.01
            self._dbg_xslw1[k] = xslw1
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
        # rain moments recompute (:2398-2403)
        for k in range(nz):
            lamr = (AM_R * o.crg[2] * o.org2 * nr[k] / rr[k]) ** o.obmr
            ilamr[k] = 1.0 / lamr
            mvd_r[k] = (3.0 + MU_R + 0.672) / lamr
            N0_r[k] = nr[k] * o.org2 * lamr ** o.cre[1]

        # ---- condensation Newton (:2410-2441): rc = R1 and ssatw < 0
        # everywhere, so only the (ssatw < -eps and L_qc) arm could run
        # — L_qc is False throughout in this regime; keep the guard for
        # fidelity
        for k in range(nz):
            if (ssatw[k] > EPS) or (ssatw[k] < -EPS and L_qc[k]):
                clap = (qv[k] - qvs[k]) / (1.0 + lvt2[k] * qvs[k])
                for _ in range(3):
                    fcd = qvs[k] * math.exp(lvt2[k] * clap) - qv[k] \
                        + clap
                    dfcd = qvs[k] * lvt2[k] * math.exp(lvt2[k] * clap) \
                        + 1.0
                    clap = clap - fcd / dfcd
                xrc = rc[k] + clap
                if xrc > 0.0:
                    prw_vcd[k] = clap * odt
                else:
                    prw_vcd[k] = -rc[k] / rho[k] * odts
                qcten[k] += prw_vcd[k]
                qvten[k] -= prw_vcd[k]
                tten[k] += lvap[k] * ocp[k] * prw_vcd[k]
                rc[k] = max(R1, (qc1d[k] + dt * qcten[k]) * rho[k])
                qv[k] = max(1.0e-10, qv1d[k] + dt * qvten[k])
                temp[k] = t1d[k] + dt * tten[k]
                rho[k] = 0.622 * pres[k] / (RR2 * temp[k]
                                            * (qv[k] + 0.622))
                qvs[k] = o.rslf(pres[k], temp[k])
                ssatw[k] = qv[k] / qvs[k] - 1.0

        # ---- rain evaporation (:2447-2506) -------------------------
        pnr_rev = z.copy()
        for k in range(nz):
            if (ssatw[k] < -EPS) and L_qr[k] and not (prw_vcd[k] > 0.0):
                tempc_k = temp[k] - 273.15
                otemp = 1.0 / temp[k]
                rhof[k] = math.sqrt(RHO_NOT / rho[k])
                rhof2[k] = math.sqrt(rhof[k])
                diffu[k] = (2.11e-5 * (temp[k] / 273.15) ** 1.94
                            * (101325.0 / pres[k]))
                if tempc_k >= 0.0:
                    visco[k] = (1.718 + 0.0049 * tempc_k) * 1.0e-5
                else:
                    visco[k] = (1.718 + 0.0049 * tempc_k
                                - 1.2e-5 * tempc_k * tempc_k) * 1.0e-5
                vsc2[k] = math.sqrt(rho[k] / visco[k])
                lvap[k] = LVAP0 + (2106.0 - 4218.0) * tempc_k
                tcond[k] = (5.69 + 0.0168 * tempc_k) * 1.0e-5 * 418.936
                ocp[k] = 1.0 / (CP2 * (1.0 + 0.887 * qv[k]))

                rvs = rho[k] * qvs[k]
                rvs_p = rvs * otemp * (lvap[k] * otemp * ORV - 1.0)
                rvs_pp = rvs * (otemp * (lvap[k] * otemp * ORV - 1.0)
                                * otemp * (lvap[k] * otemp * ORV - 1.0)
                                + (-2.0 * lvap[k] * otemp ** 3 * ORV)
                                + otemp * otemp)
                gamsc = lvap[k] * diffu[k] / tcond[k] * rvs_p
                alphsc = (0.5 * (gamsc / (1.0 + gamsc)) ** 2
                          * rvs_pp / rvs_p * rvs / rvs_p)
                alphsc = max(1.0e-9, alphsc)
                xsat = min(-1.0e-9, ssatw[k])
                t1_evap = (2.0 * PI2
                           * (1.0 - alphsc * xsat
                              + 2.0 * alphsc * alphsc * xsat * xsat
                              - 5.0 * alphsc ** 3 * xsat ** 3)
                           / (1.0 + gamsc))
                lamr = 1.0 / ilamr[k]
                if qv[k] / qvs[k] < 0.95 and rr[k] / rho[k] <= 1.0e-8:
                    prv_rev[k] = rr[k] / rho[k] * odts
                else:
                    prv_rev[k] = (t1_evap * diffu[k] * (-ssatw[k])
                                  * N0_r[k] * rvs
                                  * (o.t1_qr_ev * ilamr[k] ** o.cre[9]
                                     + o.t2_qr_ev * vsc2[k] * rhof2[k]
                                     * ((lamr + 0.5 * FV_R)
                                        ** (-o.cre[10]))))
                    rate_max = min(rr[k] / rho[k] * odts,
                                   (qvs[k] - qv[k]) * odts)
                    prv_rev[k] = min(rate_max, prv_rev[k] / rho[k])
                pnr_rev[k] = min(nr[k] * 0.99 / rho[k] * odts,
                                 prv_rev[k] * nr[k] / rr[k])
                qrten[k] -= prv_rev[k]
                qvten[k] += prv_rev[k]
                nrten[k] -= pnr_rev[k]
                tten[k] -= lvap[k] * ocp[k] * prv_rev[k]
                rr[k] = max(R1, (qr1d[k] + dt * qrten[k]) * rho[k])
                qv[k] = max(1.0e-10, qv1d[k] + dt * qvten[k])
                nr[k] = max(R2, (nr1d[k] + dt * nrten[k]) * rho[k])
                temp[k] = t1d[k] + dt * tten[k]
                rho[k] = 0.622 * pres[k] / (RR2 * temp[k]
                                            * (qv[k] + 0.622))

        # ---- sedimentation (:2516-2770) ----------------------------
        pptrain = pptice = pptsnow = pptgraul = 0.0
        vtrk = np.zeros(nz + 1)
        vtnrk = np.zeros(nz + 1)
        vtik = np.zeros(nz + 1)
        vtnik = np.zeros(nz + 1)
        vtsk = np.zeros(nz + 1)
        vtgk = np.zeros(nz + 1)

        # rain fallspeeds (:2527-2554)
        nstep = 0
        ksed1_r = kts
        for k in range(nz - 1, -1, -1):
            rhof[k] = math.sqrt(RHO_NOT / rho[k])
            if rr[k] > R1:
                lamr = (AM_R * o.crg[2] * o.org2 * nr[k]
                        / rr[k]) ** o.obmr
                vtrk[k] = (rhof[k] * AV_R * o.crg[5] * o.org3
                           * lamr ** o.cre[2]
                           * ((lamr + FV_R) ** (-o.cre[5])))
                vtnrk[k] = (rhof[k] * AV_R * o.crg[6] / o.crg[11]
                            * lamr ** o.cre[11]
                            * ((lamr + FV_R) ** (-o.cre[6])))
            else:
                vtrk[k] = vtrk[k + 1]
                vtnrk[k] = vtnrk[k + 1]
            if max(vtrk[k], vtnrk[k]) > 1.0e-3:
                ksed1_r = max(ksed1_r, k)
                delta_tp = dzq[k] / max(vtrk[k], vtnrk[k])
                nstep = max(nstep, int(dt / delta_tp + 1.0))
        if ksed1_r == kte:
            ksed1_r = kte - 1
        onstep_r = 1.0 / nstep if nstep > 0 else 1.0

        # cloud ice fallspeeds (:2561-2586)
        nstep = 0
        ksed1_i = kts
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
                ksed1_i = max(ksed1_i, k)
                delta_tp = dzq[k] / vtik[k]
                nstep = max(nstep, int(dt / delta_tp + 1.0))
        if ksed1_i == kte:
            ksed1_i = kte - 1
        onstep_i = 1.0 / nstep if nstep > 0 else 1.0

        # snow fallspeeds with the T>0C melting floor (:2591-2624)
        nstep = 0
        ksed1_s = kts
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
                if temp[k] > T_0:
                    vtsk[k] = max(vts * vts_boost[k], vtrk[k])
                else:
                    vtsk[k] = vts * vts_boost[k]
            else:
                vtsk[k] = vtsk[k + 1]
            if vtsk[k] > 1e-3:
                ksed1_s = max(ksed1_s, k)
                delta_tp = dzq[k] / vtsk[k]
                nstep = max(nstep, int(dt / delta_tp + 1.0))
        if ksed1_s == kte:
            ksed1_s = kte - 1
        onstep_s = 1.0 / nstep if nstep > 0 else 1.0

        # graupel fallspeeds with the T>0C floor (:2628-2650)
        nstep = 0
        ksed1_g = kts
        for k in range(nz - 1, -1, -1):
            if rg[k] > R1:
                vtg = rhof[k] * self.av_g * self.cgg[5] \
                    * self.ogg3 * ilamg[k] ** self.bv_g
                if temp[k] > T_0:
                    vtgk[k] = max(vtg, vtrk[k])
                else:
                    vtgk[k] = vtg
            else:
                vtgk[k] = vtgk[k + 1]
            if vtgk[k] > 1e-3:
                ksed1_g = max(ksed1_g, k)
                delta_tp = dzq[k] / vtgk[k]
                nstep = max(nstep, int(dt / delta_tp + 1.0))
        if ksed1_g == kte:
            ksed1_g = kte - 1
        onstep_g = 1.0 / nstep if nstep > 0 else 1.0

        # rain sedimentation (:2660-2688)
        for _n in range(_nint(1.0 / onstep_r)):
            sed_r = vtrk[:nz] * rr
            sed_n = vtnrk[:nz] * nr
            k = kte
            odzq = 1.0 / dzq[k]
            orho = 1.0 / rho[k]
            qrten[k] -= sed_r[k] * odzq * onstep_r * orho
            nrten[k] -= sed_n[k] * odzq * onstep_r * orho
            rr[k] = max(R1, rr[k] - sed_r[k] * odzq * dt * onstep_r)
            nr[k] = max(R2, nr[k] - sed_n[k] * odzq * dt * onstep_r)
            for k in range(ksed1_r, kts - 1, -1):
                odzq = 1.0 / dzq[k]
                orho = 1.0 / rho[k]
                qrten[k] += (sed_r[k + 1] - sed_r[k]) * odzq \
                    * onstep_r * orho
                nrten[k] += (sed_n[k + 1] - sed_n[k]) * odzq \
                    * onstep_r * orho
                rr[k] = max(R1, rr[k] + (sed_r[k + 1] - sed_r[k])
                            * odzq * dt * onstep_r)
                nr[k] = max(R2, nr[k] + (sed_n[k + 1] - sed_n[k])
                            * odzq * dt * onstep_r)
            if rr[kts] > R1 * 10.0:
                pptrain += sed_r[kts] * dt * onstep_r

        # ice sedimentation (:2694-2724)
        for _n in range(_nint(1.0 / onstep_i)):
            sed_i = vtik[:nz] * ri
            sed_n = vtnik[:nz] * ni
            k = kte
            odzq = 1.0 / dzq[k]
            orho = 1.0 / rho[k]
            qiten[k] -= sed_i[k] * odzq * onstep_i * orho
            niten[k] -= sed_n[k] * odzq * onstep_i * orho
            ri[k] = max(R1, ri[k] - sed_i[k] * odzq * dt * onstep_i)
            ni[k] = max(R2, ni[k] - sed_n[k] * odzq * dt * onstep_i)
            for k in range(ksed1_i, kts - 1, -1):
                odzq = 1.0 / dzq[k]
                orho = 1.0 / rho[k]
                qiten[k] += (sed_i[k + 1] - sed_i[k]) * odzq \
                    * onstep_i * orho
                niten[k] += (sed_n[k + 1] - sed_n[k]) * odzq \
                    * onstep_i * orho
                ri[k] = max(R1, ri[k] + (sed_i[k + 1] - sed_i[k])
                            * odzq * dt * onstep_i)
                ni[k] = max(R2, ni[k] + (sed_n[k + 1] - sed_n[k])
                            * odzq * dt * onstep_i)
            if ri[kts] > R1 * 10.0:
                pptice += sed_i[kts] * dt * onstep_i

        # snow sedimentation (:2728-2746)
        for _n in range(_nint(1.0 / onstep_s)):
            sed_s = vtsk[:nz] * rs
            k = kte
            odzq = 1.0 / dzq[k]
            orho = 1.0 / rho[k]
            qsten[k] -= sed_s[k] * odzq * onstep_s * orho
            rs[k] = max(R1, rs[k] - sed_s[k] * odzq * dt * onstep_s)
            for k in range(ksed1_s, kts - 1, -1):
                odzq = 1.0 / dzq[k]
                orho = 1.0 / rho[k]
                qsten[k] += (sed_s[k + 1] - sed_s[k]) * odzq \
                    * onstep_s * orho
                rs[k] = max(R1, rs[k] + (sed_s[k + 1] - sed_s[k])
                            * odzq * dt * onstep_s)
            if rs[kts] > R1 * 10.0:
                pptsnow += sed_s[kts] * dt * onstep_s

        # graupel sedimentation (:2750-2770)
        for _n in range(_nint(1.0 / onstep_g)):
            sed_g = vtgk[:nz] * rg
            k = kte
            odzq = 1.0 / dzq[k]
            orho = 1.0 / rho[k]
            qgten[k] -= sed_g[k] * odzq * onstep_g * orho
            rg[k] = max(R1, rg[k] - sed_g[k] * odzq * dt * onstep_g)
            for k in range(ksed1_g, kts - 1, -1):
                odzq = 1.0 / dzq[k]
                orho = 1.0 / rho[k]
                qgten[k] += (sed_g[k + 1] - sed_g[k]) * odzq \
                    * onstep_g * orho
                rg[k] = max(R1, rg[k] + (sed_g[k + 1] - sed_g[k])
                            * odzq * dt * onstep_g)
            if rg[kts] > R1 * 10.0:
                pptgraul += sed_g[kts] * dt * onstep_g

        # debug capture for test diagnosis (not part of the transcription)
        self.debug = dict(vtgk=vtgk.copy(), vtsk=vtsk.copy(),
                          vtrk=vtrk.copy(), qgten=qgten.copy(),
                          qrten=qrten.copy(), ilamg=ilamg.copy(),
                          prg_rfz=prg_rfz.copy(), pri_rfz=pri_rfz.copy(),
                          prg_rcs=prg_rcs.copy(), prr_sml=prr_sml.copy())

        # ---- instant melt / instant freeze (:2774-2795) ------------
        for k in range(nz):
            xri = max(0.0, qi1d[k] + qiten[k] * dt)
            if temp[k] > T_0 and xri > 0.0:
                qcten[k] += xri * odt
                qiten[k] -= xri * odt
                niten[k] = -ni1d[k] * odt
                tten[k] -= LFUS * ocp[k] * xri * odt
            xrc = max(0.0, qc1d[k] + qcten[k] * dt)
            if temp[k] < HGFR and xrc > 0.0:
                lfus2 = LSUB - lvap[k]
                qiten[k] += xrc * odt
                niten[k] += xrc / XM0I * odt
                qcten[k] -= xrc * odt
                tten[k] += lfus2 * ocp[k] * xrc * odt

        # ---- final application (:2797-2843) ------------------------
        for k in range(nz):
            t1d[k] = t1d[k] + tten[k] * dt
            qv1d[k] = max(1e-10, qv1d[k] + qvten[k] * dt)
            qc1d[k] = qc1d[k] + qcten[k] * dt
            if qc1d[k] <= R1:
                qc1d[k] = 0.0
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
            qr1d[k] = qr1d[k] + qrten[k] * dt
            nr1d[k] = max(R2 / rho[k], nr1d[k] + nrten[k] * dt)
            if qr1d[k] <= R1:
                qr1d[k] = 0.0
                nr1d[k] = 0.0
            else:
                lamr = (AM_R * o.crg[2] * o.org2 * nr1d[k]
                        / qr1d[k]) ** o.obmr
                mvd_r[k] = (3.0 + MU_R + 0.672) / lamr
                if mvd_r[k] > 2.5e-3:
                    mvd_r[k] = 2.5e-3
                elif mvd_r[k] < D0R * 0.75:
                    mvd_r[k] = D0R * 0.75
                lamr = (3.0 + MU_R + 0.672) / mvd_r[k]
                nr1d[k] = o.crg[1] * o.org3 * qr1d[k] \
                    * lamr ** BM_R / AM_R
            qs1d[k] = qs1d[k] + qsten[k] * dt
            if qs1d[k] <= R1:
                qs1d[k] = 0.0
            qg1d[k] = qg1d[k] + qgten[k] * dt
            if qg1d[k] <= R1:
                qg1d[k] = 0.0

        return (qv1d, qc1d, qr1d, nr1d, qi1d, ni1d, qs1d, qg1d, t1d,
                pptrain, pptice, pptsnow, pptgraul)
