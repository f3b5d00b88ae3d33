"""Loop-for-loop transcription of the simple local-K PBL diffusion.

Literal port of /root/reference/src/physics/pbl_simple.f90 (simple_pbl
:71-141, diffuse_variable :143-163, pbl_diffusion :165-212, calc_shear
:214-226, calc_virt_pot_temp_zgradient :228-249, stability :251-274,
calc_richardson_gradient :276-291) with the reference's per-(k, j) loop
structure. (z, y, x) numpy layout, float32.

NOTE the reference computes the diffusion substep count PER Y-SLICE
(pbl_diffusion, pbl_simple.f90:198); icar_tpu uses the global maximum
(a deliberate, documented divergence — the per-slice count depends on the
arbitrary domain slicing). The oracle keeps the reference behavior, so
parity tests must use inputs whose per-slice max equals the global max.

Test oracle only: independent of icar_tpu.
"""

import numpy as np

f32 = np.float32

GRAVITY = f32(9.81)
KARMAN = f32(0.41)   # icar_constants.f90:397
PR_UPPER = f32(4.0)
PR_LOWER = f32(0.25)
ASYMP_LENGTH_SCALE = f32(1 / 250.0)
N_SUBSTEPS = f32(10.0)
DIFFUSION_REDUCTION = f32(2.0)
KLC_WATER = 2


def simple_pbl(th, qv, cloud, ice, qrain, qsnow, um, vm, pii, rho, z, dz,
               terrain, land_mask, dt):
    """pbl_simple.f90:71-141. All 3D arrays (nz, ny, nx); terrain and
    land_mask (ny, nx). Returns updated copies of
    (th, qv, cloud, ice, qrain, qsnow)."""
    nz, ny, nx = th.shape
    kte = nz - 1  # min(kme-1, kte_in): top level never diffused directly
    th = np.asarray(th, f32).copy()
    qv = np.asarray(qv, f32).copy()
    cloud = np.asarray(cloud, f32).copy()
    ice = np.asarray(ice, f32).copy()
    qrain = np.asarray(qrain, f32).copy()
    qsnow = np.asarray(qsnow, f32).copy()

    Kq = np.zeros((kte, ny, nx), f32)
    for j in range(ny):
        for k in range(kte):
            dz_half = (dz[k, j, :] + dz[k + 1, j, :]) * f32(0.5)
            # calc_shear (pbl_simple.f90:214-226)
            shear = np.sqrt((um[k + 1, j, :] - um[k, j, :]) ** 2
                            + (vm[k + 1, j, :] - vm[k, j, :]) ** 2) / dz_half
            shear = np.maximum(shear.astype(f32), f32(1e-5))
            # calc_virt_pot_temp_zgradient (:228-249)
            hyd0 = cloud[k, j] + ice[k, j] + qrain[k, j] + qsnow[k, j]
            hyd1 = cloud[k + 1, j] + ice[k + 1, j] + qrain[k + 1, j] + qsnow[k + 1, j]
            vth0 = th[k, j] * (f32(1) + f32(0.61) * qv[k, j] - hyd0)
            vth1 = th[k + 1, j] * (f32(1) + f32(0.61) * qv[k + 1, j] - hyd1)
            vgrad = ((vth1 - vth0) / dz_half).astype(f32)
            # calc_richardson_gradient (:276-291)
            temp = (th[k, j] * pii[k, j] + th[k + 1, j] * pii[k + 1, j]) * f32(0.5)
            rig = (GRAVITY / temp * vgrad / shear ** 2).astype(f32)
            rig = np.maximum(rig, f32(-100.0))
            # calc_pbl_stability_function (:251-274)
            stab = np.where(rig > 0,
                            np.exp(f32(-8.5) * rig) + f32(0.15) / (rig + f32(3)),
                            f32(1) / np.sqrt(f32(1) - f32(1.6)
                                             * np.minimum(rig, f32(0)))).astype(f32)
            pr = np.clip((f32(1.5) + f32(3.08) * rig).astype(f32),
                         PR_LOWER, PR_UPPER)
            # HP96 eqn 12 mixing length (:113)
            l = f32(1) / (f32(1) / (KARMAN * (z[k, j] - terrain[j]))
                          + ASYMP_LENGTH_SCALE)
            K = (l ** 2 * stab * shear).astype(f32)
            kq = (K / pr * f32(dt) / dz_half).astype(f32)
            kq = np.clip(kq, f32(1.0), f32(1000.0))
            kq = np.where(land_mask[j] == KLC_WATER, kq / f32(1000.0), kq)
            Kq[k, j] = kq / DIFFUSION_REDUCTION

        # pbl_diffusion for this y-slice (:165-212)
        rho_dz = (dz[:kte, j] * rho[:kte, j]).astype(f32)
        rhomean = ((rho[:kte, j] + rho[1:kte + 1, j]) * f32(0.5)).astype(f32)
        Kq[:, j] = np.where(Kq[:, j] > N_SUBSTEPS * dz[:kte, j],
                            dz[:kte, j] * N_SUBSTEPS, Kq[:, j])
        nsub = int(np.ceil(2 * (Kq[:, j] / dz[:kte, j]).max()))
        Kq[:, j] = Kq[:, j] / f32(nsub)
        for _ in range(nsub):
            for q in (qv, th, cloud, ice, qsnow, qrain):
                # diffuse_variable (:143-163)
                flux = (Kq[:, j] * rhomean
                        * (q[:kte, j] - q[1:kte + 1, j])).astype(f32)
                q[0, j] = q[0, j] - flux[0] / rho_dz[0]
                q[1:kte, j] = q[1:kte, j] - (flux[1:] - flux[:-1]) / rho_dz[1:]
                # top fluxes end up in the top layer, divided by the
                # rho_dz of the level BELOW (reference quirk, :160)
                q[kte, j] = q[kte, j] + flux[kte - 1] / rho_dz[kte - 1]
    return th, qv, cloud, ice, qrain, qsnow
