"""GHG concentration resolution (rad_parameters read_ghg;
ra_clWRF_support.f90 + the wrappers' annual CO2 formula)."""

import os
import tempfile

import numpy as np

from icar_tpu.physics.ghg import (annual_co2, read_cam_gases,
                                  DEFAULT_N2O, DEFAULT_CH4)


def test_annual_co2_formula():
    # (280 + 90*exp(0.02*(yr-2000)))*1e-6  (ra_rrtmg_lw.f90:11904)
    assert abs(annual_co2(2000) - 370e-6) < 1e-9
    assert annual_co2(2050) > annual_co2(2000)


def test_missing_file_falls_back_to_defaults():
    g = read_cam_gases(2020, 100.0, path="/does/not/exist")
    assert abs(g.co2 - annual_co2(2020)) < 1e-12
    assert g.n2o == DEFAULT_N2O and g.ch4 == DEFAULT_CH4


def test_cam_file_interpolation_and_units():
    with tempfile.NamedTemporaryFile("w", suffix=".txt",
                                     delete=False) as f:
        f.write("h\nh\n")
        f.write("2019  410.000  331.000  1866.000  226.000  503.000\n")
        f.write("2021  414.000  333.000  1876.000  222.000  495.000\n")
        p = f.name
    try:
        g = read_cam_gases(2020, 182.0, path=p)
        assert abs(g.co2 - 412e-6) < 1e-6          # ppm -> vmr
        assert abs(g.n2o - 332e-9) < 1e-9          # ppb -> vmr
        assert abs(g.ch4 - 1871e-9) < 2e-9
        assert abs(g.cfc11 - 224e-12) < 1e-12      # ppt -> vmr
    finally:
        os.unlink(p)


def test_invalid_gas_column_uses_default():
    with tempfile.NamedTemporaryFile("w", suffix=".txt",
                                     delete=False) as f:
        f.write("h\nh\n")
        f.write("2019  410.000  -9999.0  1866.000  226.000  503.000\n")
        f.write("2021  414.000  -9999.0  1876.000  222.000  495.000\n")
        p = f.name
    try:
        g = read_cam_gases(2020, 182.0, path=p)
        assert g.n2o == DEFAULT_N2O
        assert abs(g.co2 - 412e-6) < 1e-6
    finally:
        os.unlink(p)
