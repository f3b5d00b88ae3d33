"""Calendar math tests (mirrors src/tests/test_calendar.f90 / test_time_obj.f90)."""

import pytest

from icar_tpu.utils.calendar import (
    GREGORIAN, NOLEAP, THREESIXTY, Time, TimeDelta, date_to_mjd, mjd_to_date,
)


@pytest.mark.parametrize("cal", [GREGORIAN, NOLEAP, THREESIXTY])
def test_roundtrip(cal):
    for date in [(2020, 12, 1, 2, 0, 0.0), (1999, 1, 1, 0, 0, 0.0),
                 (2001, 4, 2, 23, 59, 30.0), (1858, 11, 17, 0, 0, 0.0)]:
        if cal == THREESIXTY and date[2] == 31:
            continue
        mjd = date_to_mjd(*date, calendar=cal)
        assert mjd_to_date(mjd, cal) == pytest.approx(date)


def test_gregorian_epoch():
    # MJD epoch is 1858-11-17 00:00
    assert date_to_mjd(1858, 11, 17) == 0.0
    assert date_to_mjd(2000, 1, 1) == 51544.0


def test_leap_years():
    assert date_to_mjd(2020, 3, 1) - date_to_mjd(2020, 2, 1) == 29
    assert date_to_mjd(2021, 3, 1) - date_to_mjd(2021, 2, 1) == 28
    assert date_to_mjd(1900, 3, 1) - date_to_mjd(1900, 2, 1) == 28  # century
    assert date_to_mjd(2000, 3, 1) - date_to_mjd(2000, 2, 1) == 29  # 400-year


def test_noleap_and_360():
    assert (date_to_mjd(2021, 1, 1, calendar=NOLEAP)
            - date_to_mjd(2020, 1, 1, calendar=NOLEAP)) == 365
    assert (date_to_mjd(2021, 1, 1, calendar=THREESIXTY)
            - date_to_mjd(2020, 1, 1, calendar=THREESIXTY)) == 360


def test_time_arithmetic():
    t = Time.from_string("2020-12-01 00:00:00")
    dt = TimeDelta.from_units(hours=1)
    t2 = t + dt
    assert (t2 - t).seconds() == 3600.0
    assert t2 > t
    assert t2.date()[:4] == (2020, 12, 1, 1)
    many = t + TimeDelta.from_units(days=31)
    assert many.date()[:3] == (2021, 1, 1)


def test_parse_formats():
    assert Time.from_string("2020-12-01 02:00:00").date()[:4] == (2020, 12, 1, 2)
    assert Time.from_string("2020/12/01").date()[:3] == (2020, 12, 1)
    assert Time.from_string("2020-12-01T02:30:15").date()[3:] == (2, 30, 15.0)


def test_day_of_year():
    t = Time.from_string("2020-02-01 12:00:00")
    assert t.day_of_year() == pytest.approx(31.5)
    assert t.year_length() == 366.0
    t = Time.from_string("2021-01-01 00:00:00")
    assert t.day_of_year() == 0.0
    assert t.year_length() == 365.0
