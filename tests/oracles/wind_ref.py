"""Level-by-level transcription of the mass-balancing wind solver.

Literal port of /root/reference/src/physics/wind.f90
(calc_divergence :172-228, balance_uvw :81-169, iterative_winds :371-498)
keeping the Fortran's k-recurrence explicit. (z, y, x) numpy layout,
float32. Test oracle only: independent of icar_tpu.
"""

import numpy as np

f32 = np.float32


def calc_divergence(u, v, w, jaco_u, jaco_v, jaco_w, dz, dx, jaco,
                    horz_only=False):
    """wind.f90:172-228."""
    nz, ny, nx = w.shape
    u_met = (u * jaco_u).astype(f32)
    v_met = (v * jaco_v).astype(f32)
    diff_u = u_met[:, :, 1:nx + 1] - u_met[:, :, :nx]
    diff_v = v_met[:, 1:ny + 1, :] - v_met[:, :ny, :]
    div = ((diff_u + diff_v) / f32(dx)).astype(f32)
    if horz_only:
        return div
    w_met = (w * jaco_w).astype(f32)
    for k in range(nz):
        if k == 0:
            div[k] = div[k] + w_met[k] / dz[k]
        else:
            div[k] = div[k] + (w_met[k] - w_met[k - 1]) / dz[k]
    return (div / jaco).astype(f32)


def balance_uvw(u, v, jaco_u, jaco_v, jaco_w, dz, dx, jaco):
    """wind.f90:81-169: w from the k-recurrence
    w(k)*jaco_w(k) = w(k-1)*jaco_w(k-1) - div(k)*dz(k), w(ground)=0."""
    nz, ny, nx = jaco.shape
    w = np.zeros((nz, ny, nx), f32)
    div = calc_divergence(u, v, w, jaco_u, jaco_v, jaco_w, dz, dx, jaco,
                          horz_only=True)
    for k in range(nz):
        if k == 0:
            w[k] = (f32(0.0) - div[k] * dz[k]) / jaco_w[k]
        else:
            w[k] = (w[k - 1] * jaco_w[k - 1] - div[k] * dz[k]) / jaco_w[k]
    return w


def iterative_winds(u, v, jaco_u, jaco_v, jaco_w, dz, dx, jaco,
                    n_iterations):
    """wind.f90:371-498: fix w (minus its linearly-growing top-level
    share), then iteratively distribute residual divergence onto u, v."""
    nz, ny, nx = jaco.shape
    u = np.asarray(u, f32).copy()
    v = np.asarray(v, f32).copy()
    w = balance_uvw(u, v, jaco_u, jaco_v, jaco_w, dz, dx, jaco)

    smooth_height = dz.sum(axis=0)
    corr = np.minimum(np.cumsum(dz, axis=0) / smooth_height, f32(1.0))
    w = (w - corr * w[nz - 1]).astype(f32)

    u_cor = f32(0.5)
    adj_coef = f32(-2.0) / f32(dx)
    for _ in range(n_iterations + 1):
        div = calc_divergence(u, v, w, jaco_u, jaco_v, jaco_w, dz, dx, jaco)
        adj = (div / adj_coef).astype(f32)
        # u(ims+2:ime, jms+1:jme-1) += (adj(i-1) - adj(i)) * u_cor
        for i in range(2, nx):
            u[:, 1:ny - 1, i] += (adj[:, 1:ny - 1, i - 1]
                                  - adj[:, 1:ny - 1, i]) * u_cor
        for j in range(2, ny):
            v[:, j, 1:nx - 1] += (adj[:, j - 1, 1:nx - 1]
                                  - adj[:, j, 1:nx - 1]) * u_cor
    return u, v, w
