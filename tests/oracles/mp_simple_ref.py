"""Scalar-Python transcription of the SB04 simple microphysics.

Literal, loop-for-loop port of /root/reference/src/physics/mp_simple.f90
(sat_mr :146-182, cloud_conversion :198-280, cloud2hydrometeor :295-315,
phase_change :333-362, mp_conversions :381-420, sediment :437-459,
mp_simple :481-566, mp_simple_driver :595-646). All arithmetic is done in
numpy float32 scalars to mirror the reference's single-precision math.

This is a test oracle: slow by design, independent of icar_tpu.
"""

import numpy as np

f32 = np.float32

LH_VAPOR = f32(2.26e6)
DLHVDT = f32(2400.0)
LH_LIQUID = f32(3.34e5)
HEAT_CAPACITY = f32(1006.0)
SMALL_VALUE = f32(1e-30)
SNOW_FORMATION_TC = 1 / 2000.0
RAIN_FORMATION_TC = 1 / 500.0
FREEZING = f32(273.15)
SNOW_FALL_RATE = f32(1.5)
RAIN_FALL_RATE = f32(10.0)
SNOW_CLOUD_INIT = f32(1e-4)
RAIN_CLOUD_INIT = f32(1e-4)


def sat_mr(temperature, pressure):
    # mp_simple.f90:146-182
    if temperature < FREEZING:
        a, b = f32(21.8745584), f32(7.66)
    else:
        a, b = f32(17.2693882), f32(35.86)
    e_s = f32(610.78) * np.exp(a * (temperature - f32(273.16))
                               / (temperature - b)).astype(f32)
    if (pressure - e_s) <= 0:
        e_s = pressure * f32(0.99999)
    return f32(0.6219907) * e_s / (pressure - e_s)


def cloud_conversion(pressure, temperature, qv, qc, dt):
    # mp_simple.f90:198-280; returns (temperature, qv, qc, qvsat)
    maxerr = f32(1e-4)
    iteration = 0
    lastqv = qv + maxerr * f32(2)
    vapor2temp = (LH_VAPOR + (f32(373.15) - temperature) * DLHVDT) / HEAT_CAPACITY
    pre_qc, pre_qv, pre_t = qc, qv, temperature
    qvsat = f32(0.0)

    while abs(lastqv - qv) > maxerr and iteration < 15:
        iteration += 1
        lastqv = qv
        qvsat = sat_mr(temperature, pressure)
        if qv > qvsat:
            excess = (qv - qvsat) * f32(0.5)
            temperature = temperature + excess * vapor2temp
            qv = qv - excess
            qc = qc + excess
        elif qc > 0:
            excess = (qvsat - qv) * f32(0.5)
            if excess < qc:
                temperature = temperature - excess * vapor2temp
                qv = qv + excess
                qc = qc - excess
            else:
                qv = qv + qc
                temperature = temperature - qc * vapor2temp
                qc = f32(0.0)

    if iteration == 15:
        # non-converged: revert (mp_simple.f90:248-255)
        qv = sat_mr(pre_t, pressure)
        temperature = pre_t
        qc = pre_qc

    qc = max(qc, f32(0.0))
    return temperature, qv, qc, qvsat


def cloud2hydrometeor(qc, q, conversion, qcmin):
    # mp_simple.f90:295-315
    if qc > qcmin:
        delta = qc - qc * conversion
    else:
        delta = f32(0.0)
    if delta < qc:
        qc = qc - delta
        q = q + delta
    else:
        q = q + qc
        qc = f32(0.0)
    return max(qc, f32(0.0)), q


def phase_change(temperature, q1, qmax, q2, lheat, change_rate):
    # mp_simple.f90:333-362
    mass2temp = lheat / HEAT_CAPACITY
    delta = (qmax - q2) * change_rate
    if delta > q1:
        delta = q1
    if delta > (qmax - q2) * f32(0.99):
        delta = (qmax - q2) * f32(0.99)
    q1 = q1 - delta
    if q1 < 0:
        q1 = f32(0.0)
    q2 = q2 + delta
    temperature = temperature + delta * mass2temp
    return temperature, q1, q2


def mp_conversions(pressure, temperature, qv, qc, qr, qs, dt,
                   cloud2rain, cloud2snow):
    # mp_simple.f90:381-420
    l_melt = -LH_LIQUID
    l_evap = -(LH_VAPOR + (f32(373.15) - temperature) * DLHVDT)
    l_subl = l_melt + l_evap
    temperature, qv, qc, qvsat = cloud_conversion(pressure, temperature,
                                                  qv, qc, dt)
    if (qc + qr + qs) > SMALL_VALUE:
        if qc > SMALL_VALUE:
            if temperature > FREEZING:
                qc, qr = cloud2hydrometeor(qc, qr, cloud2rain, RAIN_CLOUD_INIT)
                if qs > SMALL_VALUE:
                    temperature, qs, qr = phase_change(
                        temperature, qs, f32(100.0), qr, l_melt, cloud2rain)
            else:
                qc, qs = cloud2hydrometeor(qc, qs, cloud2snow, SNOW_CLOUD_INIT)
        if qv < qvsat:
            if qr > SMALL_VALUE:
                temperature, qr, qv = phase_change(
                    temperature, qr, qvsat, qv, l_evap, cloud2rain / f32(2))
            if qs > SMALL_VALUE:
                temperature, qs, qv = phase_change(
                    temperature, qs, qvsat, qv, l_subl, cloud2snow / f32(2))
    return temperature, qv, qc, qr, qs


def sediment(q, v, rho, dz):
    # mp_simple.f90:437-459; q modified in place, returns surface flux
    nz = q.shape[0]
    out = v[0] * q[0] * rho[0]
    q[0] = q[0] - out / dz[0] / rho[0]
    flux = np.zeros(nz, f32)
    for i in range(nz - 1):
        flux[i] = v[i + 1] * q[i + 1] * rho[i + 1]
    for i in range(nz - 1):
        q[i] = q[i] + flux[i] / (rho[i] * dz[i])
        q[i + 1] = q[i + 1] - flux[i] / (rho[i + 1] * dz[i + 1])
    return out


def mp_simple_column(pressure, temperature, rho, qv, qc, qr, qs, rain, snow,
                     dt, dz, cloud2rain, cloud2snow):
    # mp_simple.f90:481-566 (one column). Arrays (nz,) float32, modified
    # copies returned.
    nz = pressure.shape[0]
    pressure = pressure.astype(f32).copy()
    temperature = temperature.astype(f32).copy()
    qv = qv.astype(f32).copy()
    qc = qc.astype(f32).copy()
    qr = qr.astype(f32).copy()
    qs = qs.astype(f32).copy()
    rho = rho.astype(f32)
    dz = dz.astype(f32)
    dt = f32(dt)

    for i in range(nz):
        (temperature[i], qv[i], qc[i], qr[i], qs[i]) = mp_conversions(
            pressure[i], temperature[i], qv[i], qc[i], qr[i], qs[i], dt,
            cloud2rain, cloud2snow)

    # rain sedimentation (mp_simple.f90:507-531)
    if qr.max() > SMALL_VALUE:
        cfl = f32(np.ceil((dt / dz * RAIN_FALL_RATE).max()))
        fall = (dt * np.full(nz, RAIN_FALL_RATE, f32) / cfl).astype(f32)
        for _ in range(int(round(float(cfl)))):
            rain = rain + sediment(qr, fall, rho, dz)
            for i in range(nz):
                l_evap = -(LH_VAPOR + (f32(373.15) - temperature[i]) * DLHVDT)
                qvsat = sat_mr(temperature[i], pressure[i])
                if qv[i] < qvsat and qr[i] > SMALL_VALUE:
                    temperature[i], qr[i], qv[i] = phase_change(
                        temperature[i], qr[i], qvsat, qv[i], l_evap,
                        cloud2rain / (f32(2) * cfl))

    # snow sedimentation (mp_simple.f90:534-564)
    if qs.max() > SMALL_VALUE:
        cfl = f32(np.ceil((dt / dz * SNOW_FALL_RATE).max()))
        fall = (dt * np.full(nz, SNOW_FALL_RATE, f32) / cfl).astype(f32)
        for _ in range(int(round(float(cfl)))):
            snowfall = sediment(qs, fall, rho, dz)
            snow = snow + snowfall
            rain = rain + snowfall
            for i in range(nz):
                l_evap = -(LH_VAPOR + (f32(373.15) - temperature[i]) * DLHVDT)
                l_subl = -LH_LIQUID + l_evap
                qvsat = sat_mr(temperature[i], pressure[i])
                if qv[i] < qvsat and qs[i] > SMALL_VALUE:
                    temperature[i], qs[i], qv[i] = phase_change(
                        temperature[i], qs[i], qvsat, qv[i], l_subl,
                        cloud2snow / (f32(2) * cfl))

    return temperature, qv, qc, qr, qs, rain, snow


def mp_simple_driver(pressure, th, pii, rho, qv, qc, qr, qs, rain, snow,
                     dt, dz):
    """Grid driver (mp_simple_driver, mp_simple.f90:595-646). All 3D arrays
    are (nz, ny, nx); rain/snow (ny, nx). Returns updated copies."""
    nz, ny, nx = pressure.shape
    th = np.asarray(th, f32).copy()
    qv = np.asarray(qv, f32).copy()
    qc = np.asarray(qc, f32).copy()
    qr = np.asarray(qr, f32).copy()
    qs = np.asarray(qs, f32).copy()
    rain = np.asarray(rain, f32).copy()
    snow = np.asarray(snow, f32).copy()
    cloud2snow = np.exp(f32(-SNOW_FORMATION_TC * dt)).astype(f32)
    cloud2rain = np.exp(f32(-RAIN_FORMATION_TC * dt)).astype(f32)

    for j in range(ny):
        for i in range(nx):
            t_col = (th[:, j, i] * pii[:, j, i]).astype(f32)
            (t_col, qv[:, j, i], qc[:, j, i], qr[:, j, i], qs[:, j, i],
             rain[j, i], snow[j, i]) = mp_simple_column(
                pressure[:, j, i], t_col, rho[:, j, i], qv[:, j, i],
                qc[:, j, i], qr[:, j, i], qs[:, j, i], rain[j, i],
                snow[j, i], dt, dz[:, j, i], cloud2rain, cloud2snow)
            th[:, j, i] = t_col / pii[:, j, i]
    return th, qv, qc, qr, qs, rain, snow
