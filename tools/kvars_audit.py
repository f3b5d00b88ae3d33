#!/usr/bin/env python
"""kVARS registry audit (VERDICT r2 missing #6).

Maps every member of the reference's kVARS variable registry
(/root/reference/src/constants/icar_constants.f90, type
var_constants_type — 232 entries + last_var) and every
default_output_metadata.f90 output name onto this package's registry
(icar_tpu/registry.py), or onto a documented exclusion with its reason.
Run it to regenerate docs/kvars_audit.md; tests/test_kvars_audit.py
asserts the mapping stays total (no silent variable gaps).

Usage: python tools/kvars_audit.py [--ref /root/reference] [-o docs/kvars_audit.md]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# kVARS / output-metadata name -> icar_tpu registry name (pure renames;
# the reference uses both long kVARS names and short CF-ish output names)
RENAMES = {
    "cloud_number_concentration": "cloud_number",
    "ice_number_concentration": "ice_number",
    "rain_in_air": "rain_mass",
    "rain_number_concentration": "rain_number",
    "snow_in_air": "snow_mass",
    "snow_number_concentration": "snow_number",
    "graupel_in_air": "graupel_mass",
    "graupel_number_concentration": "graupel_number",
    "snow_water_equivalent": "swe",
    "coeff_heat_exchange_3d": "exch_h",
    "land_emissivity": "emissivity",
    "tend_swrad": "tend_th_swrad",
    # short output-metadata names
    "ta2m": "temperature_2m", "hus2m": "humidity_2m",
    "qv": "water_vapor", "qc": "cloud_water", "qi": "cloud_ice",
    "qr": "rain_mass", "qs": "snow_mass", "qg": "graupel_mass",
    "nc": "cloud_number", "ni": "ice_number", "nr": "rain_number",
    "ns": "snow_number", "ng": "graupel_number",
    "ts": "skin_temperature", "u10m": "u_10m", "v10m": "v_10m",
    "psfc": "surface_pressure", "hfss": "sensible_heat",
    "hfls": "latent_heat", "hfgs": "ground_heat_flux",
    "rsds": "shortwave", "rlds": "longwave",
    "rlut": "out_longwave_rad",
    "pressure_i": "pressure_interface",
    "temperature_i": "temperature_interface",
    "cu_precipitation": "convective_precipitation",
    "precip": "precipitation",
    "canopy_ice": "canopy_water_ice",
    "canopy_liquid": "canopy_water_liquid",
    "clt": "cloud_fraction",
    "cosz": "cosine_zenith_angle",
    "dz_i": "dz_interface",
    "emiss": "emissivity",
    "lat": "latitude", "lon": "longitude",
    "lwcf": "longwave_cloud_forcing",
    "swcf": "shortwave_cloud_forcing",
    "snow_albedo_0": "snow_albedo_prev",
    "swe_0": "snow_water_eq_prev",
    "tau_ss": "snow_age_factor",
    "surface_roughness": "roughness_z0",
    "w_grid": "w",
    "z_i": "z_interface",
}

# kVARS name -> (related registry fields, note): the quantity exists in
# icar_tpu under a different decomposition/diagnostic granularity
COVERED = {
    "tend_qv": ("tend_qv_adv/tend_qv_pbl/tend_qv_cu",
                "split per producing package instead of one shared field"),
    "tend_th": ("tend_th_lwrad/tend_th_swrad/tend_th_cu",
                "split per producing package"),
    "tend_qc": ("tend_qc_cu", "only the KF driver stores qc tendencies"),
    "tend_qi": ("tend_qi_cu", "only the KF driver stores qi tendencies"),
    "tend_qs": ("tend_qs_cu", "only the KF driver stores qs tendencies"),
    "tend_qr": ("tend_qr_cu", "only the KF driver stores qr tendencies"),
}

# exclusion groups: kVARS entries whose owning scheme/option is disabled
# at ICAR's hardwired configuration (the reference allocates the id but
# the pathway never runs), plus derivable/static quantities
GECROS = ("GECROS crop model: disabled at ICAR's hardwired NoahMP "
          "option set (opt_crop, lsm_noahmpdrv.f90)")
IRRIGATION = ("NoahMP irrigation options: disabled at ICAR's hardwired "
              "NoahMP option set")
NOAHMP_TILE = ("per-tile (vegetated/bare/canopy) NoahMP diagnostic; the "
               "aggregate fluxes (sensible_heat, latent_heat, "
               "ground_heat_flux, temperature_2m...) are stored instead")
NOAHMP_CARBON = ("NoahMP carbon/photosynthesis outputs: dynamic-"
                 "vegetation carbon option disabled at ICAR's hardwired "
                 "option set (dveg=4)")
NOAHMP_GW = ("NoahMP MMF groundwater option (opt_run=5) not enabled by "
             "ICAR (hardwired opt_run=3)")
NOAHMP_SOILCOMP = ("alternative soil-composition inputs (opt_soil>1) "
                   "not enabled by ICAR (hardwired opt_soil=1)")
GEOMETRY = ("static geometry derivable from grid.Geometry (lat/lon + "
            "staggering offsets); never time-varying output")
DERIVABLE = "derivable diagnostic; not stored as a separate field"

EXCLUDED = {}
for n in ("mass_leaf", "mass_root", "mass_stem", "mass_wood",
          "mass_ag_grain", "crop_category", "crop_type", "date_planting",
          "date_harvest", "growing_season_gdd", "growing_degree_days",
          "plant_growth_stage", "gecros_state"):
    EXCLUDED[n] = GECROS
for n in ("irr_frac_total", "irr_frac_sprinkler", "irr_frac_micro",
          "irr_frac_flood", "irr_eventno_sprinkler", "irr_eventno_micro",
          "irr_eventno_flood", "irr_alloc_sprinkler", "irr_alloc_micro",
          "irr_alloc_flood", "irr_evap_loss_sprinkler",
          "irr_amt_sprinkler", "irr_amt_micro", "irr_amt_flood",
          "evap_heat_sprinkler"):
    EXCLUDED[n] = IRRIGATION
for n in ("frac_between_gap", "frac_within_gap",
          "ground_temperature_bare", "ground_temperature_canopy",
          "surface_rad_temperature", "temperature_2m_veg",
          "temperature_2m_bare", "mixing_ratio_2m_veg",
          "mixing_ratio_2m_bare", "rad_absorbed_total",
          "rad_absorbed_veg", "rad_absorbed_bare", "rad_net_longwave",
          "longwave_up", "rlus", "evap_canopy", "evap_soil_surface",
          "transpiration_rate", "ch_veg", "ch_veg_2m", "ch_bare",
          "ch_bare_2m", "ch_under_canopy", "ch_leaf",
          "sensible_heat_veg", "sensible_heat_bare",
          "sensible_heat_canopy", "evap_heat_veg", "evap_heat_bare",
          "evap_heat_canopy", "transpiration_heat", "ground_heat_veg",
          "ground_heat_bare", "net_longwave_veg", "net_longwave_bare",
          "net_longwave_canopy", "snowfall_ground", "rainfall_ground",
          "vegetation_fraction_out"):
    EXCLUDED[n] = NOAHMP_TILE
for n in ("net_ecosystem_exchange", "gross_primary_prod",
          "net_primary_prod", "apar", "photosynthesis_total",
          "stomatal_resist_total", "stomatal_resist_sun",
          "stomatal_resist_shade"):
    EXCLUDED[n] = NOAHMP_CARBON
for n in ("eq_soil_moisture", "smc_watertable_deep", "recharge",
          "recharge_deep"):
    EXCLUDED[n] = NOAHMP_GW
for n in ("soil_texture_1", "soil_texture_2", "soil_texture_3",
          "soil_texture_4", "soil_sand_and_clay", "soil_carbon_stable",
          "soil_carbon_fast", "soil_class_1", "soil_class_2",
          "soil_class_3", "soil_class_4",
          "soil_sand_and_clay_composition"):
    EXCLUDED[n] = NOAHMP_SOILCOMP
for n in ("u_latitude", "u_longitude", "v_latitude", "v_longitude",
          "u_lat", "u_lon", "v_lat", "v_lon", "znu", "znw"):
    EXCLUDED[n] = GEOMETRY
EXCLUDED.update({
    "last_var": "sentinel, not a variable",
    "external_precipitation": (
        "external precipitation forcing: latent reference pathway "
        "(exch_t reads it only when external files supply it); "
        "load_external_conditions covers the snow/soil external inputs"),
    "vegetation_fraction_max": NOAHMP_CARBON,
    "storage_lake": ("NoahMP lake water storage: ICAR routes lake cells "
                     "to the CLM lake model (water=3) instead"),
    "soil_totalmoisture": DERIVABLE + " (sum of soil_water_content)",
    "soil_column_total_water": DERIVABLE
    + " (sum of soil_water_content)",
    "tend_qc_pbl": ("PBL scalar tendencies applied in place by the "
                    "vectorized schemes; no separate stored field"),
    "tend_qi_pbl": "see tend_qc_pbl",
    "tend_th_pbl": "see tend_qc_pbl",
    "tend_u": ("no enabled scheme produces u/v tendencies in the "
               "reference configuration (cu momentum transport off)"),
    "tend_v": "see tend_u",
    "kpbl": ("PBL top stored as a height (hpbl) rather than a level "
             "index"),
    "precip_rate": DERIVABLE + " (difference of precipitation between "
    "outputs)",
})


def parse_kvars(ref_root):
    src = open(os.path.join(
        ref_root, "src/constants/icar_constants.f90")).read()
    m = re.search(r"type var_constants_type(.*?)end type var_constants_type",
                  src, re.S)
    return re.findall(r"integer\s*::\s*(\w+)", m.group(1))


def parse_outmeta(ref_root):
    src = open(os.path.join(
        ref_root, "src/io/default_output_metadata.f90")).read()
    return sorted(set(re.findall(r'name\s*=\s*"([^"]+)"', src)))


def classify(name, registry_names):
    if name in registry_names:
        return ("registry", name)
    if name in RENAMES and RENAMES[name] in registry_names:
        return ("renamed", RENAMES[name])
    if name in COVERED:
        return ("covered", COVERED[name])
    if name in EXCLUDED:
        return ("excluded", EXCLUDED[name])
    return ("UNACCOUNTED", None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("-o", "--output", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "kvars_audit.md"))
    args = ap.parse_args()

    from icar_tpu import registry
    reg = set(registry.spec_names())
    kvars = parse_kvars(args.ref)
    outmeta = parse_outmeta(args.ref)

    lines = [
        "# kVARS registry audit",
        "",
        "Generated by `python tools/kvars_audit.py`. Every member of the",
        "reference's kVARS registry (`icar_constants.f90` "
        "var_constants_type,",
        f"{len(kvars)} entries) and every `default_output_metadata.f90` "
        f"name ({len(outmeta)})",
        "maps to an `icar_tpu/registry.py` entry or to a documented",
        "exclusion. `tests/test_kvars_audit.py` keeps this total.",
        "",
    ]
    counts = {}
    for title, names in (("kVARS entries", kvars),
                         ("output-metadata names", outmeta)):
        lines += [f"## {title}", "", "| name | status | maps to / reason |",
                  "|---|---|---|"]
        for n in names:
            kind, detail = classify(n, reg)
            counts[kind] = counts.get(kind, 0) + 1
            if kind == "covered":
                detail = f"{detail[0]} — {detail[1]}"
            lines.append(f"| {n} | {kind} | {detail} |")
        lines.append("")
    lines += ["## Summary", "",
              " ".join(f"{k}: {v}" for k, v in sorted(counts.items()))]
    with open(args.output, "w") as f:
        f.write("\n".join(lines) + "\n")
    un = counts.get("UNACCOUNTED", 0)
    print(f"wrote {args.output}; {counts}")
    return 1 if un else 0


if __name__ == "__main__":
    sys.exit(main())
