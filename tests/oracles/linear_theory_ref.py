"""Closed-form 1D linear mountain-wave solution (independent oracle).

Analytic Smith & Barstad (2004) / Barstad & Schuller (2011) solution for
flow over a y-invariant ridge, transcribed from the reference's own
standalone validation script /root/reference/helpers/ideal_linear.py
(setup_experiment/solve, ideal_linear.py:192-269): per-wavenumber vertical
wavenumber m = sign(sigma)*sqrt(Ndsq*k^2/sigma^2), eta_hat = Fzs*e^{imz},
w_hat = i*sigma*eta_hat, u_hat = -m*sigma*k*i*eta_hat/k^2.

This solves the SAME physics the model's LUT build solves
(linear_perturbation_at_height, linear_winds.f90:181-237) but through an
independent 1D code path, so a consistently-wrong model field cannot agree
with it. The only deliberate deviation from ideal_linear.py is the
wavenumber grid: we use the exact fftshift(fftfreq) angular grid (the
script's linspace(-pi/dx, pi/dx, Nx) misplaces k=0 by half a bin; see
ops/linear_winds.wavenumber_grids), and the k=0 mode is set to zero
explicitly (a mean terrain offset drives no perturbation).

Test oracle only: pure numpy, independent of icar_tpu.
"""

import numpy as np


def solve_uw(zs, dx, U, Ndsq, zlevels):
    """Linear-theory wind perturbations over a 1D terrain profile.

    zs: (Nx,) terrain [m]; U background wind [m/s]; Ndsq Brunt-Vaisala
    frequency squared [1/s^2]; zlevels: heights above the surface [m].
    Returns (u_prime, w) of shape (len(zlevels), Nx)."""
    zs = np.asarray(zs, np.float64)
    Nx = zs.shape[0]
    Fzs = np.fft.fftshift(np.fft.fft(zs)) / Nx

    k = 2 * np.pi * np.fft.fftshift(np.fft.fftfreq(Nx, d=dx))
    sig = U * k
    denom = np.where(sig == 0, 1.0, sig) ** 2
    msq = (Ndsq / denom * k ** 2).astype(complex)
    m = np.where(msq >= 0,
                 np.sign(sig) * np.sqrt(np.abs(msq)) + 0j,
                 1j * np.sqrt(np.abs(msq)))
    m = np.where(k == 0, 0.0, m)

    k2 = np.where(k == 0, 1.0, k ** 2)
    up = np.zeros((len(zlevels), Nx))
    w = np.zeros((len(zlevels), Nx))
    for iz, z in enumerate(zlevels):
        neta = np.where(k == 0, 0.0, Fzs * np.exp(1j * m * z))
        Fw = 1j * sig * neta
        Fu = (-m * (sig * k) * 1j * neta) / k2
        w[iz] = Nx * np.real(np.fft.ifft(np.fft.ifftshift(Fw)))
        up[iz] = Nx * np.real(np.fft.ifft(np.fft.ifftshift(Fu)))
    return up, w
