"""End-to-end LFB pipeline test on synthetic dirty fixtures (FIXTURES.md):
literal "NULL" strings, USRN=0, zero-Latitude linked scrub, mixed-case
ward names, NULL IncidentGroup, negative AQ values, wdir>360, missing
weather days, AQ gaps > 12h (Unknown FK path)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lfb_data_warehouse_spark.plans.lfb_pipeline import (
    derive_incident_type,
    run_pipeline,
    warehouse_checks,
)

LFB_COLS = (
    "IncidentNumber string, DateOfCall date, TimeOfCall string, "
    "IncidentGroup string, StopCodeDescription string, SpecialServiceType string, "
    "PropertyCategory string, PropertyType string, USRN long, "
    "IncGeo_BoroughCode string, ProperCase string, IncGeo_WardCode string, "
    "IncGeo_WardName string, Latitude double, Longitude double, "
    "IncidentStationGround string, FirstPumpArriving_AttendanceTime int, "
    "FirstPumpArriving_DeployedFromStation string, NumStationsWithPumpsAttending int, "
    "NumPumpsAttending int, PumpMinutesRounded int, `Notional Cost (£)` int, NumCalls int"
)


def d(s):
    return dt.date.fromisoformat(s)


@pytest.fixture(scope="module")
def warehouse(spark):
    lfb = spark.createDataFrame(
        [
            # clean row
            ("I1", d("2021-06-01"), "10:00:00", "Fire", "Primary Fire", None,
             "Dwelling", "House", 123, "B1", "Camden", "W1", "holborn",
             51.5, -0.12, "Soho", 300, "Soho", 1, 2, 60, 400, 2),
            # dirty row: "NULL" strings, USRN=0, zero lat, mixed-case ward
            # 03:00 on 06-02: 15h after the 06-01 reading, 27h before the
            # 06-03 one → no AQ match within ±12h
            ("I2", d("2021-06-02"), "03:00:00", "Special Service", "Special Service",
             "Flooding", "Outdoor", "Lake", 0, "B1", "Camden", "W1", "HOLBORN",
             0.0, -0.5, "Soho", None, "NULL", None, None, None, None, None),
            # NULL incident group → Unknown sentinel type; unmatched ward
            ("I3", d("2021-06-03"), "05:15:00", None, None, None,
             None, None, 55, "B2", "Westminster", None, "abbey road",
             51.52, -0.2, "Paddington", 120, "Paddington", 2, 3, 30, 200, 1),
        ],
        LFB_COLS,
    )
    weather = spark.createDataFrame(
        # wdir 370 → 10 (% 360); 2021-06-03 missing (Unknown WeatherKey path)
        [("2021-06-01", 15.0, 10.0, 20.0, 370.0, 12.0, 30.0, 1013.0, 0.5, 0.0, 30000.0),
         ("2021-06-02", None, None, None, None, None, None, None, None, None, None)],
        "date string, tavg double, tmin double, tmax double, wdir double, "
        "wspd double, wpgt double, pres double, prcp double, snow double, tsun double",
    )
    aq = spark.createDataFrame(
        # reading near I1 (2h away); negative value scrubbed; nothing within
        # 12h of I2's 23:30 call on 06-02? 06-01 12:00 is 35.5h before → miss
        [("PM10", "01/06/2021 12:00", 30.0, "site1"),
         ("PM10", "01/06/2021 12:00", -5.0, "site1"),
         ("NO2", "01/06/2021 12:00", 55.0, "site1"),
         ("O3", "03/06/2021 06:00", 80.0, "site1")],
        "Species string, ReadingDateTime string, Value double, Site string",
    )
    wb = spark.createDataFrame(
        [("OLD1", "W1", "Holborn", "Camden", 2021, 79.0, 6.0, 120.0, 0.5),
         ("OLD2", "W9", "Nowhere", "Camden", 2020, None, 2.0, 20.0, 4.0)],
        "`Old Ward Code` string, `New ward code` string, Ward string, Borough string, "
        "Year int, Life_Expectancy double, Unemployment double, Crime double, "
        "Deliberate_Fires double",
    )
    tables = run_pipeline(spark, lfb, weather, aq, wb)
    return {k: v.cache() for k, v in tables.items()}


def test_contract_passes(warehouse):
    results = warehouse_checks(warehouse)
    failed = [r for r in results if not r.passed]
    assert not failed, failed


def test_fact_rows_and_fk_resolution(warehouse):
    fact = {r["IncidentNumber"]: r for r in warehouse["lfb_call"].collect()}
    assert len(fact) == 3
    # I1: matched AQ reading (2h away), weather present, wellbeing (W1,2021)
    assert fact["I1"]["AirQualityKey"] != "Unknown"
    assert fact["I1"]["WeatherKey"] != "Unknown"
    assert fact["I1"]["WellBeingID"] != "Unknown"
    assert fact["I1"]["CostPerCall"] == 200  # 400 / 2
    # I2: no AQ reading within 12h → Unknown; measures defaulted
    assert fact["I2"]["AirQualityKey"] == "Unknown"
    assert fact["I2"]["NotionalCost"] == 0 and fact["I2"]["NumCalls"] == 1
    assert fact["I2"]["CostPerCall"] == 0
    # I3: NULL group → Unknown incident type key; missing weather day;
    # NULL ward code → Unknown ward
    assert fact["I3"]["IncidentTypeKey"] == "Unknown"
    assert fact["I3"]["WeatherKey"] == "Unknown"
    assert fact["I3"]["WardID"] == "Unknown"
    # I3's call at 05:15 on 06-03 is 45 min from the 06:00 O3 reading
    assert fact["I3"]["AirQualityKey"] != "Unknown"


def test_well_being_dim_format_modes(spark):
    """Reference load_wb_dim.py:44-57 produce_schema parity: the three
    dimensionFormat modes filter the dim's columns by name suffix —
    only-labels keeps exactly the *Label ordinals, only-numeric exactly
    the numeric metrics (faithfully including the reference's behavior
    of dropping key/ward/year in the filtered modes)."""
    import pytest as _pytest

    from lfb_data_warehouse_spark.plans.lfb_pipeline import (
        WB_STRATEGIES,
        well_being_dim,
    )

    wb = spark.createDataFrame(
        [("OLD1", "W1", "Holborn", "Camden", 2021, 79.0, 6.0, 120.0, 0.5)],
        "`Old Ward Code` string, `New ward code` string, Ward string, Borough string, "
        "Year int, Life_Expectancy double, Unemployment double, Crime double, "
        "Deliberate_Fires double",
    )
    metrics = list(WB_STRATEGIES)
    full = well_being_dim(wb)  # preserve-all default
    assert full.columns == (
        ["WellBeingID", "WardCode", "WardName", "Year"]
        + metrics
        + [f"{m}Label" for m in metrics]
    )
    labels = well_being_dim(wb, "only-labels")
    assert labels.columns == [f"{m}Label" for m in metrics]
    numeric = well_being_dim(wb, "only-numeric")
    assert numeric.columns == metrics
    # sentinel row is added before the filter (cleanse→load ordering):
    # it survives as all-"Unknown" labels / all-NULL metrics
    assert labels.filter(" AND ".join(f"{c} = 'Unknown'" for c in labels.columns)).count() == 1
    assert numeric.filter(" AND ".join(f"{c} IS NULL" for c in numeric.columns)).count() == 1
    with _pytest.raises(ValueError, match="dimension_format"):
        well_being_dim(wb, "only-ids")


def test_cleansing_applied(warehouse):
    ward = {r["WardCode"]: r for r in warehouse["ward"].collect()}
    # mixed-case ward names standardized before collapse
    assert ward["W1"]["WardName"] == "Holborn"
    assert "Unknown" in ward  # sentinel member


def test_incident_type_rules(spark):
    df = spark.createDataFrame(
        [("Special Service", "Special Service", "Flooding"),
         ("Fire", "Primary Fire", None),
         (None, None, None),
         ("Use of Special Operations Room", "x", None)],
        "IncidentGroup string, StopCodeDescription string, SpecialServiceType string",
    )
    rows = derive_incident_type(df).collect()
    by_group = {(r["IncidentGroup"], r["StopCodeDescription"]): r for r in rows}
    ss = by_group[("Special Service", "Special Service")]
    assert ss["IncidentType"] == "Special Service" and ss["IncidentDescription"] == "Flooding"
    assert by_group[(None, None)]["IncidentTypeKey"] == "Unknown"
    sor = by_group[("Use of Special Operations Room", "x")]
    # IncidentType == "Use of Special Operations Room" triggers the
    # description override regardless of the StopCodeDescription
    assert sor["IncidentDescription"] == "Use of Special Operations Room"


def test_weather_bucketing_labels(warehouse):
    w = {str(r["date"]): r for r in warehouse["weather"].collect() if r["date"]}
    r1 = w["2021-06-01"]
    assert r1["TemperatureCategory"] == "Mild"  # tavg 15
    assert r1["WindDirection"] == "North"  # 370 % 360 = 10 → North
    assert r1["TemperatureAmplitude"] == "High"  # 20-10=10 ∈ [10,15)
    r2 = w["2021-06-02"]
    assert r2["TemperatureCategory"] == "Unknown"  # all-NULL day


def test_aq_negative_scrub_and_pivot(warehouse):
    aq = warehouse["air_quality"]
    rows = [r for r in aq.collect() if r["AirQualityKey"] != "Unknown"]
    by_ts = {str(r["ReadingDateTime"]): r for r in rows}
    r = by_ts["2021-06-01 12:00:00"]
    # negative -5 scrubbed → avg(30) = 30 → "Unhealthy for Sensitive"? 30∈[25,50) Moderate
    assert r["PM10Level"] == "Moderate"
    assert r["NO2Level"] == "Moderate"  # 55 ∈ [40,80)
    assert r["PM1Level"] == "Unknown"  # species never observed


def test_marts_shapes(warehouse):
    pm = warehouse["per_month"].collect()
    assert len(pm) == 1 and pm[0]["IncidentCount"] == 3
    assert pm[0]["TotalCost"] == 600
    plt = warehouse["per_location_type"].collect()
    # I2 has NULL attendance → filtered; 2 location-type rows remain
    assert sum(r["IncidentCount"] for r in plt) == 2
