"""Slice-for-slice transcription of the upwind (donor-cell) advection.

Literal port of /root/reference/src/physics/advect.f90
(setup_module_winds :318-360, advect3d :107-178) with the Fortran's own
array-slice structure kept per y-slice, translated from (i=x, k=z, j=y)
Fortran layout into this repo's (z, y, x) numpy layout. float32
throughout. Test oracle only: independent of icar_tpu.
"""

import numpy as np

f32 = np.float32


def setup_module_winds(u, v, w, dx, dt, jaco_u, jaco_v, jaco_w, rho,
                       advect_density=False):
    """advect.f90:318-360. u (nz,ny,nx+1), v (nz,ny+1,nx), w (nz,ny,nx).

    Returns (U_m, V_m, W_m): U_m over internal x-faces (nz,ny,nx-1),
    V_m over internal y-faces (nz,ny-1,nx), W_m (nz,ny,nx)."""
    nz, ny, nx = w.shape
    if not advect_density:
        rho = np.ones_like(w)
    U_m = (u[:, :, 1:nx] * dt * jaco_u[:, :, 1:nx]
           * (rho[:, :, 1:] + rho[:, :, :-1]) * f32(0.5) / f32(dx)).astype(f32)
    V_m = (v[:, 1:ny, :] * dt * jaco_v[:, 1:ny, :]
           * (rho[:, 1:, :] + rho[:, :-1, :]) * f32(0.5) / f32(dx)).astype(f32)
    W_m = np.empty_like(w)
    W_m[:nz - 1] = (w[:nz - 1] * dt * jaco_w[:nz - 1]
                    * (rho[1:] + rho[:-1]) * f32(0.5))
    W_m[nz - 1] = w[nz - 1] * dt * jaco_w[nz - 1] * rho[nz - 1]
    return U_m.astype(f32), V_m.astype(f32), W_m.astype(f32)


def advect3d(q, U_m, V_m, W_m, rho_in, dz, jaco, advect_density=False):
    """advect.f90:107-178. One scalar field (nz, ny, nx); returns the
    advected copy. Only y-slices jms+1..jme-1 and x cells ims+1..ime-1 are
    updated; boundary cells are untouched."""
    nz, ny, nx = q.shape
    q = np.asarray(q, f32).copy()
    qin = q.copy()
    rho = np.ones_like(q) if not advect_density else np.asarray(rho_in, f32)

    for j in range(1, ny - 1):
        # f1 = flux through x-faces 1..nx-1 (between cells f-1, f)
        Uf = U_m[:, j, :]                       # (nz, nx-1)
        f1 = ((Uf + np.abs(Uf)) * qin[:, j, :nx - 1]
              + (Uf - np.abs(Uf)) * qin[:, j, 1:nx]) * f32(0.5)
        # f3 = flux through the north face of cells 1..nx-2
        Vn = V_m[:, j, 1:nx - 1]                # face between rows j, j+1
        f3 = ((Vn + np.abs(Vn)) * qin[:, j, 1:nx - 1]
              + (Vn - np.abs(Vn)) * qin[:, j + 1, 1:nx - 1]) * f32(0.5)
        # f4 = flux through the south face
        Vs = V_m[:, j - 1, 1:nx - 1]            # face between rows j-1, j
        f4 = ((Vs + np.abs(Vs)) * qin[:, j - 1, 1:nx - 1]
              + (Vs - np.abs(Vs)) * qin[:, j, 1:nx - 1]) * f32(0.5)
        # f5 = flux through z-interfaces k..k+1 for k = 0..nz-2
        Wf = W_m[:nz - 1, j, 1:nx - 1]
        f5 = ((Wf + np.abs(Wf)) * qin[:nz - 1, j, 1:nx - 1]
              + (Wf - np.abs(Wf)) * qin[1:nz, j, 1:nx - 1]) * f32(0.5)

        jr = jaco[:, j, 1:nx - 1] * rho[:, j, 1:nx - 1]
        # horizontal advection
        q[:, j, 1:nx - 1] = q[:, j, 1:nx - 1] - ((f1[:, 1:] - f1[:, :-1])
                                                 + (f3 - f4)) / jr
        # vertical: middle layers
        q[1:nz - 1, j, 1:nx - 1] = (q[1:nz - 1, j, 1:nx - 1]
                                    - (f5[1:] - f5[:-1])
                                    / (dz[1:nz - 1, j, 1:nx - 1] * jr[1:nz - 1]))
        # bottom layer
        q[0, j, 1:nx - 1] = (q[0, j, 1:nx - 1]
                             - f5[0] / (dz[0, j, 1:nx - 1] * jr[0]))
        # top layer
        q[nz - 1, j, 1:nx - 1] = (
            q[nz - 1, j, 1:nx - 1]
            - (qin[nz - 1, j, 1:nx - 1] * W_m[nz - 1, j, 1:nx - 1] - f5[-1])
            / (dz[nz - 1, j, 1:nx - 1] * jr[nz - 1]))
    return q
