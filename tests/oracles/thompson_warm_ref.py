"""Independent oracle: literal transcription of the Thompson scheme's
warm-rain process core.

Deliberate line-for-line transcription (test-only, like mp_simple_ref.py)
of /root/reference/src/physics/mp_thompson.f90 restricted to the warm,
ice-free regime — every frozen-process rate is exactly zero when the
column satisfies T > T_0 everywhere with qi = qs = qg = 0 (their masks
all require sub-freezing temperatures or a frozen species), so skipping
the frozen blocks reproduces the reference bit-for-bit for such columns.

Covered, in the reference's exact order:
  * column setup + thermodynamic derivations  (mp_thompson.f90:1160-1197)
  * rain moments / y-intercept               (:1489-1494)
  * warm-rain processes: self-collection, Berry-Reinhardt
    autoconversion, accretion via t_Efrw      (:1496-1546)
  * depletion limiters (cloud/rain)           (:2014-2110)
  * tendency application + rain mass/number
    balance                                   (:2117-2235)
  * TAU+1 update + rain moment recompute      (:2247-2403)
  * condensation/evaporation Newton iteration (:2406-2441)
  * rain evaporation (Srivastava & Coen)      (:2444-2506)
  * rain sedimentation w/ time splitting      (:2516-2556, 2660-2688)
  * final application + number balance        (:2797-2844)

Constants and the gamma-function coefficients are transcribed from the
module header (:52-200) and thompson_init (:424-640); the t_Efrw
collision-efficiency table from table_Efrw (:3464-3525); rslf from the
Flatau polynomial (:3776-3795).
"""

import math

import numpy as np

# module constants (mp_thompson.f90:52-200)
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
LVAP0 = 2.5e6
D0C = 1.0e-6
D0R = 50.0e-6
SC = 0.632
AV_R = 4854.0
BV_R = 1.0
FV_R = 195.0
AM_R = PI2 * RHO_W / 6.0
BM_R = 3.0
MU_R = 0.0
NBINS = 100
NBC = NBINS
NBR = NBINS


def _wgamma(y):
    return math.gamma(y)


class WarmThompsonOracle:
    """Precomputes the init-time coefficients for given (Nt_c, mu_c)."""

    def __init__(self, Nt_c=100e6, Ef_rw_l=False):
        self.Nt_c = Nt_c
        self.mu_c = min(15.0, (1000.0e6 / Nt_c + 2.0))
        sc3 = SC ** (1.0 / 3.0)
        # rain distribution gammas (thompson_init, :459-479)
        cre = [BM_R + 1., MU_R + 1., BM_R + MU_R + 1., BM_R * 2. + MU_R + 1.,
               MU_R + BV_R + 1., BM_R + MU_R + BV_R + 1.,
               BM_R * 0.5 + MU_R + BV_R + 1., BM_R + MU_R + BV_R + 3.,
               MU_R + BV_R + 3., MU_R + 2., 0.5 * (BV_R + 5. + 2. * MU_R),
               BM_R * 0.5 + MU_R + 1., BM_R * 2. + MU_R + BV_R + 1.]
        self.cre = cre
        self.crg = [_wgamma(c) for c in cre]
        self.obmr = 1.0 / BM_R
        self.org2 = 1.0 / self.crg[1]
        self.org3 = 1.0 / self.crg[2]
        # cloud distribution gammas (:436-441)
        cce = [self.mu_c + 1., BM_R + self.mu_c + 1., BM_R + self.mu_c + 4.]
        self.ccg = [_wgamma(c) for c in cce]
        self.ocg1 = 1.0 / self.ccg[0]
        self.ocg2 = 1.0 / self.ccg[1]
        # collection/evaporation prefactors (:538-553)
        self.t1_qr_qc = PI2 * 0.25 * AV_R * self.crg[8]
        self.t1_qr_ev = 0.78 * self.crg[9]
        self.t2_qr_ev = 0.308 * sc3 * math.sqrt(AV_R) * self.crg[10]
        # rain/cloud diameter bins (:581-610)
        self.Dc = D0C + 1.0e-6 * np.arange(NBC)
        xDx = np.empty(NBR + 1)
        xDx[0] = D0R
        xDx[NBR] = 0.005
        for n in range(1, NBR):
            xDx[n] = math.exp(n / float(NBR)
                              * math.log(xDx[NBR] / xDx[0])
                              + math.log(xDx[0]))
        self.Dr = np.sqrt(xDx[:-1] * xDx[1:])
        self.t_Efrw = self._table_efrw(Ef_rw_l)

    def _table_efrw(self, ef_rw_l):
        """table_Efrw (mp_thompson.f90:3464-3525)."""
        t = np.zeros((NBR, NBC))
        for j in range(NBC):
            for i in range(NBR):
                Dc, Dr = self.Dc[j], self.Dr[i]
                p = Dc / Dr
                if Dr < 50.0e-6 or Dc < 3.0e-6:
                    t[i, j] = 0.0
                    continue
                if p > 0.25:
                    X = Dc * 1.0e6
                    if Dr < 75.0e-6:
                        ef = 0.026794 * X - 0.20604
                    elif Dr < 125.0e-6:
                        ef = -0.00066842 * X * X + 0.061542 * X - 0.37089
                    elif Dr < 175.0e-6:
                        ef = (4.091e-06 * X ** 4 - 0.00030908 * X ** 3
                              + 0.0066237 * X * X - 0.0013687 * X
                              - 0.073022)
                    elif Dr < 250.0e-6:
                        ef = (9.6719e-5 * X ** 3 - 0.0068901 * X * X
                              + 0.17305 * X - 0.65988)
                    elif Dr < 350.0e-6:
                        ef = (9.0488e-5 * X ** 3 - 0.006585 * X * X
                              + 0.16606 * X - 0.56125)
                    else:
                        ef = (0.00010721 * X ** 3 - 0.0072962 * X * X
                              + 0.1704 * X - 0.46929)
                else:
                    vtr = (-0.1021 + 4.932e3 * Dr - 0.9551e6 * Dr * Dr
                           + 0.07934e9 * Dr ** 3 - 0.002362e12 * Dr ** 4)
                    stokes = Dc * Dc * vtr * RHO_W / (9. * 1.718e-5 * Dr)
                    reynolds = 9. * stokes / (p * p * RHO_W)
                    F = math.log(reynolds)
                    G = -0.1007 - 0.358 * F + 0.0261 * F * F
                    K0 = math.exp(G)
                    z = math.log(stokes / (K0 + 1.0e-15))
                    H = (0.1465 + 1.302 * z - 0.607 * z * z
                         + 0.293 * z ** 3)
                    yc0 = 2.0 / PI2 * math.atan(H)
                    ef = (yc0 + p) ** 2 / ((1. + p) ** 2)
                val = max(0.0, min(ef, 0.95))
                if ef_rw_l and ef != 0.0:
                    val = 1.0
                t[i, j] = val
        return t

    @staticmethod
    def rslf(p, t):
        """Flatau saturation mixing ratio (mp_thompson.f90:3776-3795)."""
        C = [.611583699e03, .444606896e02, .143177157e01, .264224321e-1,
             .299291081e-3, .203154182e-5, .702620698e-8, .379534310e-11,
             -.321582393e-13]
        x = max(-80.0, t - 273.16)
        esl = C[8]
        for c in reversed(C[:8]):
            esl = c + x * esl
        return 0.622 * esl / (p - esl)

    def step(self, qv1d, qc1d, qr1d, nr1d, t1d, p1d, dzq, dt):
        """One column step (mp_thompson subroutine, warm ice-free path).

        All inputs numpy float64 scalar-per-level arrays, index 0 =
        surface (kts). Returns (qv, qc, qr, nr, t, pptrain [m])."""
        o = self
        kte = len(qv1d)
        qv1d = qv1d.copy()
        qc1d = qc1d.copy()
        qr1d = qr1d.copy()
        nr1d = nr1d.copy()
        t1d = t1d.copy()
        odt = 1.0 / dt
        dtsave = dt
        odts = 1.0 / dtsave
        pptrain = 0.0

        z = np.zeros(kte)
        tten, qvten, qcten, qrten, nrten = (z.copy() for _ in range(5))
        prw_vcd, prv_rev = z.copy(), z.copy()
        prr_wau, prr_rcw, pnr_wau, pnr_rcr, pnr_rev = (
            z.copy() for _ in range(5))

        # -- column setup (:1181-1160..)
        temp = t1d.copy()
        qv = np.maximum(1.0e-10, qv1d)
        pres = p1d.copy()
        rho = 0.622 * pres / (RR2 * temp * (qv + 0.622))
        rc = np.where(qc1d > R1, qc1d * rho, R1)
        L_qc = qc1d > R1
        qc1d = np.where(L_qc, qc1d, 0.0)
        rr = np.empty(kte)
        nr = np.empty(kte)
        mvd_r = np.zeros(kte)
        L_qr = qr1d > R1
        for k in range(kte):
            if L_qr[k]:
                rr[k] = qr1d[k] * rho[k]
                nr[k] = max(R2, nr1d[k] * rho[k])
                lamr = (AM_R * o.crg[2] * o.org2 * nr[k] / rr[k]) ** o.obmr
                mvd_r[k] = (3.0 + MU_R + 0.672) / lamr
                if mvd_r[k] > 2.5e-3:
                    mvd_r[k] = 2.5e-3
                    lamr = (3.0 + MU_R + 0.672) / mvd_r[k]
                    nr[k] = o.crg[1] * o.org3 * rr[k] * lamr ** BM_R / AM_R
                elif mvd_r[k] < D0R * 0.75:
                    mvd_r[k] = D0R * 0.75
                    lamr = (3.0 + MU_R + 0.672) / mvd_r[k]
                    nr[k] = o.crg[1] * o.org3 * rr[k] * lamr ** BM_R / AM_R
            else:
                qr1d[k] = 0.0
                nr1d[k] = 0.0
                rr[k] = R1
                nr[k] = R2

        # -- thermodynamics (:1169-1197)
        tempc = temp - 273.15
        rhof = np.sqrt(RHO_NOT / rho)
        rhof2 = np.sqrt(rhof)
        qvs = np.array([o.rslf(pres[k], temp[k]) for k in range(kte)])
        ssatw = qv / qvs - 1.0
        ssatw = np.where(np.abs(ssatw) < EPS, 0.0, ssatw)
        diffu = 2.11e-5 * (temp / 273.15) ** 1.94 * (101325.0 / pres)
        visco = np.where(tempc >= 0.0, (1.718 + 0.0049 * tempc) * 1.0e-5,
                         (1.718 + 0.0049 * tempc
                          - 1.2e-5 * tempc * tempc) * 1.0e-5)
        ocp = 1.0 / (CP2 * (1.0 + 0.887 * qv))
        vsc2 = np.sqrt(rho / visco)
        lvap = LVAP0 + (2106.0 - 4218.0) * tempc
        tcond = (5.69 + 0.0168 * tempc) * 1.0e-5 * 418.936

        # -- rain y-intercept/slope (:1489-1494)
        ilamr = np.empty(kte)
        N0_r = np.empty(kte)
        for k in range(kte):
            lamr = (AM_R * o.crg[2] * o.org2 * nr[k] / rr[k]) ** o.obmr
            ilamr[k] = 1.0 / lamr
            mvd_r[k] = (3.0 + MU_R + 0.672) / lamr
            N0_r[k] = nr[k] * o.org2 * lamr ** o.cre[1]

        # -- warm-rain processes (:1500-1546)
        mvd_c = np.full(kte, D0C)
        for k in range(kte):
            if L_qr[k] and mvd_r[k] > D0R:
                Ef_rr = 2.0 - math.exp(2300.0 * (mvd_r[k] - 1600.0e-6))
                pnr_rcr[k] = Ef_rr * 4.0 * nr[k] * rr[k]
            if not L_qc[k]:
                continue
            xDc = max(D0C * 1.0e6,
                      ((rc[k] / (AM_R * o.Nt_c)) ** o.obmr) * 1.0e6)
            lamc = (o.Nt_c * AM_R * o.ccg[1] * o.ocg1 / rc[k]) ** o.obmr
            mvd_c[k] = (3.0 + o.mu_c + 0.672) / lamc
            if rc[k] > 0.01e-3:
                Dc_g = ((o.ccg[2] * o.ocg2) ** o.obmr / lamc) * 1.0e6
                Dc_b = (xDc ** 3 * Dc_g ** 3 - xDc ** 6) ** (1.0 / 6.0)
                zeta1 = 0.5 * ((6.25e-6 * xDc * Dc_b ** 3 - 0.4)
                               + abs(6.25e-6 * xDc * Dc_b ** 3 - 0.4))
                zeta = 0.027 * rc[k] * zeta1
                taud = 0.5 * ((0.5 * Dc_b - 7.5)
                              + abs(0.5 * Dc_b - 7.5)) + R1
                tau = 3.72 / (rc[k] * taud)
                prr_wau[k] = min(rc[k] * odts, zeta / tau)
                pnr_wau[k] = prr_wau[k] / (AM_R * o.mu_c * D0R ** 3)
            if L_qr[k] and mvd_r[k] > D0R and mvd_c[k] > D0C:
                lamr = 1.0 / ilamr[k]
                idx = 1 + int(NBR * math.log(mvd_r[k] / o.Dr[0])
                              / math.log(o.Dr[-1] / o.Dr[0]))
                idx = min(idx, NBR)
                Ef_rw = o.t_Efrw[idx - 1, int(mvd_c[k] * 1.0e6) - 1]
                prr_rcw[k] = min(
                    rc[k] * odts,
                    rhof[k] * o.t1_qr_qc * Ef_rw * rc[k] * N0_r[k]
                    * ((lamr + FV_R) ** (-o.cre[8])))

        # -- depletion limiters (:2036-2048, 2063-2073), frozen rates = 0
        for k in range(kte):
            sump = -prr_wau[k] - prr_rcw[k]
            rate_max = -rc[k] * odts
            if sump < rate_max and L_qc[k]:
                ratio = rate_max / sump
                prr_wau[k] *= ratio
                prr_rcw[k] *= ratio
            # rain conservation: all contributing rates frozen -> no-op

        # -- tendencies (:2117-2235), warm subset
        for k in range(kte):
            orho = 1.0 / rho[k]
            qcten[k] += (-prr_wau[k] - prr_rcw[k]) * orho
            qrten[k] += (prr_wau[k] + prr_rcw[k]) * orho
            nrten[k] += (pnr_wau[k] - pnr_rcr[k]) * orho
            # rain mass/number balance (:2181-2207)
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
            # temperature tendency (:2216-2233): all frozen terms zero

        # -- TAU+1 update (:2247-2303)
        lvt2 = np.empty(kte)
        for k in range(kte):
            temp[k] = t1d[k] + dt * tten[k]
            otemp = 1.0 / temp[k]
            tempc_k = temp[k] - 273.15
            qv[k] = max(1.0e-10, qv1d[k] + dt * qvten[k])
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
            lvt2[k] = (lvap[k] * lvap[k] * ocp[k] * ORV * otemp * otemp)

            if (qc1d[k] + qcten[k] * dt) > R1:
                rc[k] = (qc1d[k] + qcten[k] * dt) * rho[k]
                L_qc[k] = True
            else:
                rc[k] = R1
                L_qc[k] = False
            if (qr1d[k] + qrten[k] * dt) > R1:
                rr[k] = (qr1d[k] + qrten[k] * dt) * rho[k]
                nr[k] = max(R2, (nr1d[k] + nrten[k] * dt) * rho[k])
                L_qr[k] = True
                lamr = (AM_R * o.crg[2] * o.org2 * nr[k] / rr[k]) ** o.obmr
                mvd_r[k] = (3.0 + MU_R + 0.672) / lamr
                if mvd_r[k] > 2.5e-3:
                    mvd_r[k] = 2.5e-3
                    lamr = (3.0 + MU_R + 0.672) / mvd_r[k]
                    nr[k] = o.crg[1] * o.org3 * rr[k] * lamr ** BM_R / AM_R
                elif mvd_r[k] < D0R * 0.75:
                    mvd_r[k] = D0R * 0.75
                    lamr = (3.0 + MU_R + 0.672) / mvd_r[k]
                    nr[k] = o.crg[1] * o.org3 * rr[k] * lamr ** BM_R / AM_R
            else:
                rr[k] = R1
                nr[k] = R2
                L_qr[k] = False

        # -- rain moments recompute (:2398-2403)
        for k in range(kte):
            lamr = (AM_R * o.crg[2] * o.org2 * nr[k] / rr[k]) ** o.obmr
            ilamr[k] = 1.0 / lamr
            mvd_r[k] = (3.0 + MU_R + 0.672) / lamr
            N0_r[k] = nr[k] * o.org2 * lamr ** o.cre[1]

        # -- condensation/evaporation Newton (:2410-2441)
        for k in range(kte):
            if (ssatw[k] > EPS) or (ssatw[k] < -EPS and L_qc[k]):
                clap = (qv[k] - qvs[k]) / (1.0 + lvt2[k] * qvs[k])
                for _ in range(3):
                    fcd = qvs[k] * math.exp(lvt2[k] * clap) - qv[k] + clap
                    dfcd = qvs[k] * lvt2[k] * math.exp(lvt2[k] * clap) + 1.0
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
                rho[k] = 0.622 * pres[k] / (RR2 * temp[k] * (qv[k] + 0.622))
                qvs[k] = o.rslf(pres[k], temp[k])
                ssatw[k] = qv[k] / qvs[k] - 1.0

        # -- rain evaporation (:2447-2506)
        for k in range(kte):
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
                rho[k] = 0.622 * pres[k] / (RR2 * temp[k] * (qv[k] + 0.622))

        # -- terminal fallspeeds + time-split count (:2516-2556)
        vtrk = np.zeros(kte + 1)
        vtnrk = np.zeros(kte + 1)
        nstep = 0
        ksed1 = 0        # 0-based top sedimenting level
        for k in range(kte - 1, -1, -1):
            rhof[k] = math.sqrt(RHO_NOT / rho[k])
            if rr[k] > R1:
                lamr = (AM_R * o.crg[2] * o.org2 * nr[k] / rr[k]) ** o.obmr
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
                ksed1 = max(ksed1, k)
                delta_tp = dzq[k] / max(vtrk[k], vtnrk[k])
                nstep = max(nstep, int(dt / delta_tp + 1.0))
        if ksed1 == kte - 1:
            ksed1 = kte - 2
        onstep = 1.0 / nstep if nstep > 0 else 1.0

        # -- rain sedimentation (:2660-2688)
        nstep = int(round(1.0 / onstep))
        for _ in range(nstep):
            sed_r = vtrk[:kte] * rr
            sed_n = vtnrk[:kte] * nr
            k = kte - 1
            odzq = 1.0 / dzq[k]
            orho = 1.0 / rho[k]
            qrten[k] -= sed_r[k] * odzq * onstep * orho
            nrten[k] -= sed_n[k] * odzq * onstep * orho
            rr[k] = max(R1, rr[k] - sed_r[k] * odzq * dt * onstep)
            nr[k] = max(R2, nr[k] - sed_n[k] * odzq * dt * onstep)
            for k in range(ksed1, -1, -1):
                odzq = 1.0 / dzq[k]
                orho = 1.0 / rho[k]
                qrten[k] += (sed_r[k + 1] - sed_r[k]) * odzq * onstep * orho
                nrten[k] += (sed_n[k + 1] - sed_n[k]) * odzq * onstep * orho
                rr[k] = max(R1, rr[k] + (sed_r[k + 1] - sed_r[k])
                            * odzq * dt * onstep)
                nr[k] = max(R2, nr[k] + (sed_n[k + 1] - sed_n[k])
                            * odzq * dt * onstep)
            if rr[0] > R1 * 10.0:
                pptrain += sed_r[0] * dt * onstep

        # -- final application (:2797-2841), warm subset
        for k in range(kte):
            t1d[k] = t1d[k] + tten[k] * dt
            qv1d[k] = max(1.0e-10, qv1d[k] + qvten[k] * dt)
            qc1d[k] = qc1d[k] + qcten[k] * dt
            if qc1d[k] <= R1:
                qc1d[k] = 0.0
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
                nr1d[k] = o.crg[1] * o.org3 * qr1d[k] * lamr ** BM_R / AM_R
        return qv1d, qc1d, qr1d, nr1d, t1d, pptrain
