"""Options / namelist parsing tests (mirrors test_caf_options.f90 coverage)."""

import pytest

from icar_tpu import constants as C
from icar_tpu.config import Options
from icar_tpu.registry import collect_requests
from icar_tpu.utils.namelist import read_namelist

NML = """
&model_version
    version = "2.1",
    comment = "test comment"     ! trailing comment
/
&physics
    pbl = 0, lsm = 0, water=0, mp = 2,
    rad = 0, conv= 0, adv = 1, wind= 2
/
&parameters
    forcing_start_date = '2001-04-01 03:00:00',
    start_date = "2001-04-02 00:00:00",
    end_date = "2001-04-10 00:00:00",
    calendar = "standard",
    inputinterval = 3600,
    dx = 4000.0,
    nz = 15,
    smooth_wind_distance = 72000,
/
&z_info
    dz_levels = 50., 75., 125., 200., 300., 400., 7*500., 2*500.
/
&output_list
    names = "u","v","precipitation"
    outputinterval = 3600
    output_file = "output/icar_out_"
/
"""


def test_namelist_parser(tmp_path):
    p = tmp_path / "opts.nml"
    p.write_text(NML)
    nml = read_namelist(str(p))
    assert nml["model_version"]["comment"] == "test comment"
    assert nml["physics"]["mp"] == 2
    assert nml["z_info"]["dz_levels"][:3] == [50.0, 75.0, 125.0]
    assert len(nml["z_info"]["dz_levels"]) == 15
    assert nml["output_list"]["names"] == ["u", "v", "precipitation"]


def test_options_from_namelist(tmp_path):
    p = tmp_path / "opts.nml"
    p.write_text(NML)
    o = Options.from_namelist(str(p))
    assert o.physics.microphysics == C.MP_SIMPLE
    assert o.physics.windtype == C.WIND_CONSERVE_MASS
    assert o.domain.nz == 15
    assert o.domain.dx == 4000.0
    assert o.domain.dz_levels[3] == 200.0
    assert o.run.calendar == "gregorian"
    assert (o.end_time() - o.start_time()).days() == 8.0
    o.domain.nx = o.domain.ny = 50
    o.validate()


def test_reference_namelist_parses():
    """The actual reference short options file must parse."""
    o = Options.from_namelist("/root/reference/run/short_icar_options.nml")
    assert o.physics.microphysics == C.MP_THOMPSON
    assert o.physics.windtype == C.WIND_LINEAR
    assert o.domain.nz == 15
    assert len(o.domain.dz_levels) == 40
    assert o.forcing.var_names["p"] == "P"
    assert o.forcing.var_names["u"] == "U"
    assert o.output.restart_count == 24


def test_var_requests():
    o = Options()
    o.physics.microphysics = C.MP_SIMPLE
    req = collect_requests(o)
    # mp_simple advects exactly these 5 species (mp_simple.f90:116-118)
    assert req.advect == ["potential_temperature", "water_vapor", "cloud_water",
                          "rain_mass", "snow_mass"]
    assert "precipitation" in req.alloc
    assert "snowfall" in req.restart


def test_halo_width():
    o = Options()
    o.physics.advection = C.ADV_UPWIND
    assert o.halo_width() == 1
    o.physics.advection = C.ADV_MPDATA
    assert o.halo_width() == 2
