"""LFB star-schema pipeline — the reference's end-to-end warehouse
(extract→cleanse→dims→fact→marts→checks) rebuilt as a composition of
the engine's operators.

The reference implements this as ~30 single-purpose job scripts wired
by Airflow/Livy, coupled only through storage paths
(/root/reference/airflow/main-dw-project.py:373-454). Here each stage
is a pure DataFrame→DataFrame function; orchestration is function
composition (deployment scaffolding is not engine capability), and the
whole warehouse can build in ONE Spark job — intermediate hops through
storage become optional checkpoints instead of mandatory boundaries.

Semantics parity notes (SURVEY §7.4):
- incident-type derivation is ONE shared operator (the reference
  duplicates it: etl/transform/incident-type-populate.py:22-62 ==
  etl/load/load_fact.py:100-140);
- the air-quality as-of join uses operators.temporal.nearest_within —
  the reference's intended ±12 h nearest-reading semantics with its
  bucket-arithmetic bug fixed (load_fact.py:243 vs :259-261) and a
  deterministic tiebreak;
- ward collapse (etl/transform/ward-dimension.py:42-46) uses unordered
  first(ignorenulls) — nondeterministic under parallelism; we collapse
  with an explicit order (documented divergence);
- bucketing strategy tables are domain data reproduced from the
  reference (cited per table); the fold mechanism is
  functions.bucketing.bucketize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.bucketing import NullPolicy, bucketize
from ..functions.cleanse import (
    linked_scrub,
    null_sentinels,
    standardize_names,
    zero_to_null,
    zscore_scrub,
)
from ..functions.exact import avg_exact, sum_exact
from ..functions.keys import UNKNOWN, hash_key, hash_key_nullable, sentinel_row
from ..operators.agg import pivot_agg, rollup_mart
from ..operators.checks import CheckResult, assert_unique, referential_orphans, run_contract
from ..operators.dims import collapse_per_key, date_spine, latest_per_group
from ..operators.temporal import nearest_within

# ---------------------------------------------------------------------------
# Cleansing (reference etl/transform/lfb-cleanse.py)
# ---------------------------------------------------------------------------

LFB_DROP_COLUMNS = [
    # reference lfb-cleanse.py:7-21 — identifiers/geo duplicates unused
    # downstream
    "CalYear", "HourOfCall", "AddressQualifier", "Postcode_district", "UPRN",
    "IncGeo_BoroughName", "IncGeo_WardNameNew", "Easting_m", "Northing_m",
    "Easting_rounded", "Northing_rounded", "FRS", "PumpCount",
]


def cleanse_lfb(df: DataFrame) -> DataFrame:
    """String-sentinel scrub, fake-zero scrubs, ward-name standardization,
    and the stale-ward-code fix (most recent WardCode per WardName wins —
    reference lfb-cleanse.py:33-66)."""
    df = df.drop(*[c for c in LFB_DROP_COLUMNS if c in df.columns])
    df = null_sentinels(df)
    df = zero_to_null(df, ["USRN"])
    df = linked_scrub(df, F.col("Latitude") == 0.0, ["Latitude", "Longitude"])
    df = standardize_names(df, ["IncGeo_WardName"])
    # most-recent ward code per ward name (SCD-style latest-value window,
    # reference uses first() over desc DateOfCall; we add IncidentNumber
    # as a deterministic tiebreak)
    from pyspark.sql import Window

    w = Window.partitionBy("IncGeo_WardName").orderBy(
        F.col("DateOfCall").desc(), F.col("IncidentNumber").desc()
    )
    return df.withColumn("IncGeo_WardCode", F.first("IncGeo_WardCode", ignorenulls=True).over(w))


# ---------------------------------------------------------------------------
# Incident-type derivation — ONE shared operator
# (reference duplicates this logic in two files; parity bug-for-bug on the
# NULL-propagating concat key + Unknown patch)
# ---------------------------------------------------------------------------

def derive_incident_type(df: DataFrame) -> DataFrame:
    """Adds IncidentType / IncidentDescription / IncidentTypeKey.

    Rules (incident-type-populate.py:5-16): Special Service incidents
    take their type from StopCodeDescription and description from
    SpecialServiceType; "Use of Special Operations Room" overrides the
    description; NULLs default to Unknown. The key hashes with
    NULL-propagating concat, patched so the all-unknown member keys as
    the literal "Unknown" sentinel (load_fact.py:162-169)."""
    itype = F.when(
        F.col("IncidentGroup") == "Special Service", F.col("StopCodeDescription")
    ).otherwise(F.col("IncidentGroup"))
    idesc = F.when(
        F.col("IncidentGroup") == "Special Service", F.col("SpecialServiceType")
    ).otherwise(F.col("StopCodeDescription"))
    idesc = F.when(
        itype == "Use of Special Operations Room", F.lit("Use of Special Operations Room")
    ).otherwise(idesc)
    itype = F.coalesce(itype, F.lit(UNKNOWN))
    idesc = F.coalesce(idesc, F.lit("Unknown incident type"))
    key = F.when(
        (itype == UNKNOWN) & (idesc == "Unknown incident type"), F.lit(UNKNOWN)
    ).otherwise(F.sha2(F.concat(itype, F.lit("|"), idesc), 256))
    return (
        df.withColumn("IncidentType", itype)
        .withColumn("IncidentDescription", idesc)
        .withColumn("IncidentTypeKey", key)
    )


# ---------------------------------------------------------------------------
# Dimensions
# ---------------------------------------------------------------------------

def incident_type_dim(clean: DataFrame) -> DataFrame:
    dim = (
        derive_incident_type(
            clean.select("IncidentGroup", "StopCodeDescription", "SpecialServiceType").distinct()
        )
        .select("IncidentType", "IncidentDescription", "IncidentTypeKey")
        .distinct()
    )
    # the all-unknown member already keys as "Unknown"; ensure exactly one
    # sentinel row exists even on corpora with no unknown incidents
    sentinel = dim.sparkSession.createDataFrame(
        [(UNKNOWN, "Unknown incident type", UNKNOWN)], dim.schema
    )
    return dim.filter(F.col("IncidentTypeKey") != UNKNOWN).unionByName(sentinel)


def location_type_dim(clean: DataFrame) -> DataFrame:
    """derive-location-types.py:17-33: distinct (category, type) with
    Unknown defaults, concat_ws hash key, sentinel member."""
    dim = (
        clean.select("PropertyCategory", "PropertyType")
        .distinct()
        .withColumn("PropertyCategory", F.coalesce("PropertyCategory", F.lit(UNKNOWN)))
        .withColumn("PropertyType", F.coalesce("PropertyType", F.lit(UNKNOWN)))
        .withColumn("LocationTypeKey", hash_key("PropertyCategory", "PropertyType"))
    )
    sentinel = dim.sparkSession.createDataFrame([(UNKNOWN, UNKNOWN, UNKNOWN)], dim.schema)
    return dim.unionByName(sentinel)


def ward_dim(clean: DataFrame) -> DataFrame:
    """ward-dimension.py: rename, drop null codes, collapse to one row per
    WardCode (deterministic order — divergence note in module docstring),
    content-hash WardID, sentinel."""
    df = clean.select(
        F.col("IncGeo_BoroughCode").alias("BoroughCode"),
        F.col("ProperCase").alias("BoroughName"),
        F.col("IncGeo_WardCode").alias("WardCode"),
        F.col("IncGeo_WardName").alias("WardName"),
    ).filter(F.col("WardCode").isNotNull())
    collapsed = collapse_per_key(df, ["WardCode"], "WardName", ["WardName", "BoroughName", "BoroughCode"])
    dim = collapsed.withColumn(
        "WardID", hash_key("WardCode", "WardName", "BoroughName", "BoroughCode")
    )
    return sentinel_row(dim, "WardID")


def date_dim(spark: SparkSession, clean: DataFrame) -> DataFrame:
    lo, hi = clean.agg(F.min("DateOfCall"), F.max("DateOfCall")).collect()[0]
    return date_spine(spark, F.lit(lo), F.lit(hi), date_col="Date")


# Weather strategy tables — domain data from weather-cleanse.py:23-114
WEATHER_STRATEGIES: dict[str, tuple[str, list]] = {
    "tavg": ("TemperatureCategory", [
        (None, -10.0, "Very Cold"), (-10.0, 0.0, "Cold"), (0.0, 10.0, "Cool"),
        (10.0, 20.0, "Mild"), (20.0, 25.0, "Warm"), (25.0, 30.0, "Hot"),
        (30.0, None, "Very Hot")]),
    "TemperatureAmplitude": ("TemperatureAmplitude", [
        (0.0, 5.0, "Low"), (5.0, 10.0, "Moderate"), (10.0, 15.0, "High"),
        (15.0, None, "Very High")]),
    "wdir": ("WindDirection", [
        (337.5, 360.0, "North"), (0.0, 22.5, "North"), (22.5, 67.5, "Northeast"),
        (67.5, 112.5, "East"), (112.5, 157.5, "Southeast"), (157.5, 202.5, "South"),
        (202.5, 247.5, "Southwest"), (247.5, 292.5, "West"), (292.5, 337.5, "Northwest")]),
    "wspd": ("WindStrength", [
        (0.0, 1.0, "Calm"), (1.0, 5.0, "Light Air"), (5.0, 11.0, "Light Breeze"),
        (11.0, 19.0, "Gentle Breeze"), (19.0, 28.0, "Moderate Breeze"),
        (28.0, 38.0, "Fresh Breeze"), (38.0, 49.0, "Strong Breeze"),
        (49.0, 61.0, "Moderate Gale"), (61.0, 74.0, "Gale"), (74.0, 88.0, "Severe Gale"),
        (88.0, 102.0, "Storm"), (102.0, 117.0, "Violent Storm"), (117.0, None, "Hurricane")]),
    "WindGustinessPct": ("WindGustiness", [
        (0.0, 20.0, "Low"), (20.0, 50.0, "Moderate"), (50.0, 100.0, "High"),
        (100.0, None, "Very High")]),
    "pres": ("PressureLevel", [
        (None, 980.0, "Very Low"), (980.0, 1000.0, "Low"), (1000.0, 1020.0, "Normal"),
        (1020.0, 1040.0, "High"), (1040.0, None, "Very High")]),
    "prcp": ("PrecipitationLevel", [
        (0.0, 0.1, "None"), (0.1, 2.5, "Light"), (2.5, 10.0, "Moderate"),
        (10.0, 25.0, "Heavy"), (25.0, None, "Very Heavy")]),
    "snow": ("SnowLevel", [
        (0.0, 0.1, "None"), (0.1, 5.0, "Light"), (5.0, 15.0, "Moderate"),
        (15.0, 30.0, "Heavy"), (30.0, None, "Very Heavy")]),
    "tsun": ("SunshineLevel", [
        (0.0, 25200.0, "Very Short Day"), (25200.0, 28800.0, "Short Day"),
        (28800.0, 32400.0, "Normal Day"), (32400.0, 36000.0, "Long Day"),
        (36000.0, None, "Very Long Day")]),
}

WEATHER_KEY_COLS = [
    "date", "TemperatureCategory", "TemperatureAmplitude", "WindDirection",
    "WindStrength", "WindGustiness", "PressureLevel", "PrecipitationLevel",
    "SnowLevel", "SunshineLevel",
]


def weather_dim(raw: DataFrame) -> DataFrame:
    """weather-cleanse.py: derived columns (amplitude, gustiness %), wind
    direction normalized to [0,360), all numeric columns bucketed to
    ordinal labels (NULL→Unknown), content-hash WeatherKey, sentinel."""
    df = raw.withColumn(
        "TemperatureAmplitude",
        F.when(F.col("tmin").isNull() | F.col("tmax").isNull(), None).otherwise(
            F.col("tmax") - F.col("tmin")
        ),
    ).withColumn(
        "WindGustinessPct",
        F.when(F.col("wspd").isNull() | F.col("wpgt").isNull(), None)
        .when(F.col("wspd") == 0, 0.0)
        .otherwise((F.col("wpgt") - F.col("wspd")) / F.col("wspd") * 100),
    ).withColumn("wdir", F.col("wdir") % 360)
    for src, (dst, strategy) in WEATHER_STRATEGIES.items():
        df = df.withColumn(dst, bucketize(src, strategy, NullPolicy.UNKNOWN, default=UNKNOWN))
    df = df.select("date", *[dst for dst, _ in WEATHER_STRATEGIES.values()])
    df = df.withColumn("WeatherKey", hash_key(*WEATHER_KEY_COLS))
    df = df.withColumn("date", F.col("date").cast("date"))
    return sentinel_row(df, "WeatherKey")


# Air-quality strategy tables — domain data from aq-cleanse.py:46-120
AQ_STRATEGIES: dict[str, list] = {
    "PM10": [(0.0, 25.0, "Good"), (25.0, 50.0, "Moderate"),
             (50.0, 75.0, "Unhealthy for Sensitive"), (75.0, 100.0, "Unhealthy"),
             (100.0, None, "Very Unhealthy")],
    "PM2_5": [(0.0, 15.0, "Good"), (15.0, 25.0, "Moderate"),
              (25.0, 40.0, "Unhealthy for Sensitive"), (40.0, 65.0, "Unhealthy"),
              (65.0, None, "Very Unhealthy")],
    "PM1": [(0.0, 10.0, "Good"), (10.0, 20.0, "Moderate"),
            (20.0, 35.0, "Unhealthy for Sensitive"), (35.0, 50.0, "Unhealthy"),
            (50.0, None, "Very Unhealthy")],
    "NO2": [(0.0, 40.0, "Good"), (40.0, 80.0, "Moderate"),
            (80.0, 120.0, "Unhealthy for Sensitive"), (120.0, 200.0, "Unhealthy"),
            (200.0, None, "Very Unhealthy")],
    "NO": [(0.0, 50.0, "Good"), (50.0, 100.0, "Moderate"),
           (100.0, 200.0, "Unhealthy for Sensitive"), (200.0, 400.0, "Unhealthy"),
           (400.0, None, "Very Unhealthy")],
    "NOX": [(0.0, 100.0, "Good"), (100.0, 200.0, "Moderate"),
            (200.0, 300.0, "Unhealthy for Sensitive"), (300.0, 500.0, "Unhealthy"),
            (500.0, None, "Very Unhealthy")],
    "O3": [(0.0, 100.0, "Good"), (100.0, 120.0, "Moderate"),
           (120.0, 180.0, "Unhealthy for Sensitive"), (180.0, 240.0, "Unhealthy"),
           (240.0, None, "Very Unhealthy")],
    "CO": [(0.0, 10.0, "Good"), (10.0, 20.0, "Moderate"),
           (20.0, 30.0, "Unhealthy for Sensitive"), (30.0, 40.0, "Unhealthy"),
           (40.0, None, "Very Unhealthy")],
}


def air_quality_dim(raw: DataFrame) -> DataFrame:
    """aq-cleanse.py: negative scrub → timestamp parse → pivot species
    long→wide (FIXED value list for schema stability) → z-score outlier
    scrub (one stats pass, exact decimal statistics) → bucketing →
    content-hash key → sentinel."""
    df = raw.select("Species", "ReadingDateTime", "Value").withColumn(
        "Value", F.when(F.col("Value") < 0, None).otherwise(F.col("Value"))
    )
    if dict(raw.dtypes).get("ReadingDateTime") == "string":
        df = df.withColumn(
            "ReadingDateTime", F.to_timestamp("ReadingDateTime", "dd/MM/yyyy HH:mm")
        )
    species = list(AQ_STRATEGIES)
    wide = pivot_agg(
        df,
        key=["ReadingDateTime"],
        pivot_col="Species",
        values=[s.replace("_", ".") for s in species],
        agg=F.round(F.avg("Value"), 1),
    )
    for s in species:
        dotted = s.replace("_", ".")
        if dotted != s:
            wide = wide.withColumnRenamed(dotted, s)
    wide = zscore_scrub(wide, species, threshold=3.0)
    for s in species:
        wide = wide.withColumn(
            f"{s}Level", bucketize(s, AQ_STRATEGIES[s], NullPolicy.UNKNOWN, default=UNKNOWN)
        )
    wide = wide.select("ReadingDateTime", *[f"{s}Level" for s in species])
    wide = wide.withColumn("AirQualityKey", hash_key(*[f"{s}Level" for s in species]))
    return sentinel_row(wide, "AirQualityKey")


# Well-being strategy tables — subset of wb-cleanse.py:12-114 (NULL→NULL
# policy); remaining metrics use the same mechanism
WB_STRATEGIES: dict[str, list] = {
    "Life_Expectancy": [(None, 75.0, "Low"), (75.0, 80.0, "Medium"), (80.0, None, "High")],
    "Unemployment": [(None, 5.0, "Low"), (5.0, 10.0, "Medium"), (10.0, None, "High")],
    "Crime": [(None, 50.0, "Low"), (50.0, 100.0, "Medium"), (100.0, None, "High")],
    "Deliberate_Fires": [(None, 1.0, "Low"), (1.0, 3.0, "Medium"), (3.0, None, "High")],
}


WB_DIM_FORMATS = ("preserve-all", "only-labels", "only-numeric")


def well_being_dim(raw: DataFrame, dimension_format: str = "preserve-all") -> DataFrame:
    """wb-cleanse + wb-dimension: rename, per-metric ordinal labels
    (NULL→NULL policy), composite-key hash id over (ward, year),
    sentinel.

    ``dimension_format`` reproduces the reference loader's mode switch
    (load_wb_dim.py:44-57 ``produce_schema``): ``preserve-all`` keeps
    everything; ``only-labels`` keeps only the ordinal ``*Label``
    columns; ``only-numeric`` keeps only the numeric metric columns.
    Faithful to the reference, the filtered modes drop the key/ward/
    year columns too (its suffix filter excludes them) — the sentinel
    row is added BEFORE the filter, matching the cleanse→load ordering,
    so it survives as a row of "Unknown" labels / NULL metrics."""
    if dimension_format not in WB_DIM_FORMATS:
        raise ValueError(
            f"dimension_format must be one of {WB_DIM_FORMATS}, got {dimension_format!r}"
        )
    df = raw.withColumnRenamed("New ward code", "WardCode").withColumnRenamed("Ward", "WardName")
    for metric, strategy in WB_STRATEGIES.items():
        df = df.withColumn(
            f"{metric}Label", bucketize(metric, strategy, NullPolicy.NULL)
        )
    df = df.withColumn("WellBeingID", hash_key("WardCode", "Year"))
    keep = ["WellBeingID", "WardCode", "WardName", "Year"] + list(WB_STRATEGIES) + [
        f"{m}Label" for m in WB_STRATEGIES
    ]
    full = sentinel_row(df.select(*keep), "WellBeingID")
    if dimension_format == "only-labels":
        return full.select(*[c for c in full.columns if c.endswith("Label")])
    if dimension_format == "only-numeric":
        return full.select(*list(WB_STRATEGIES))
    return full


# ---------------------------------------------------------------------------
# Fact assembly (reference etl/load/load_fact.py:143-408)
# ---------------------------------------------------------------------------

FACT_COLUMNS = [
    "DateOfCall", "IncidentNumber", "TimeOfCall", "Latitude", "Longitude",
    "IncidentStationGround", "FirstPumpAttendanceTime", "FirstPumpStation",
    "StationsWithPumpsAttending", "PumpsAttending", "PumpMinutes",
    "NotionalCost", "NumCalls", "IncidentTypeKey", "LocationTypeKey",
    "WardID", "AirQualityKey", "WeatherKey", "WellBeingID", "CostPerCall",
]


def assemble_fact(
    clean: DataFrame,
    location_types: DataFrame,
    wards: DataFrame,
    air_quality: DataFrame,
    weather: DataFrame,
    well_being: DataFrame,
    tolerance_sec: int = 43200,
) -> DataFrame:
    """Fact table: incident-type key derivation, five dimension joins
    (all broadcast — dimensions are small by construction), the ±12 h
    nearest-reading air-quality as-of join, measure coalesces, and
    CostPerCall.

    Every FK is coalesced to "Unknown" post-join so the fact never
    carries NULL keys (reference pattern, load_fact.py:186-336)."""
    fact = derive_incident_type(clean)

    fact = (
        fact.join(
            F.broadcast(location_types.select("PropertyType", "LocationTypeKey")),
            "PropertyType",
            "left",
        )
        .withColumn("LocationTypeKey", F.coalesce("LocationTypeKey", F.lit(UNKNOWN)))
    )

    fact = (
        fact.withColumnRenamed("IncGeo_WardCode", "WardCode")
        .join(F.broadcast(wards.select("WardCode", "WardID")), "WardCode", "left")
        .withColumn("WardID", F.coalesce("WardID", F.lit(UNKNOWN)))
    )

    # as-of join: nearest air-quality reading within ±12 h of the call
    call_ts = F.to_timestamp(
        F.concat(F.col("DateOfCall").cast("string"), F.lit(" "), F.col("TimeOfCall")),
        "yyyy-MM-dd HH:mm:ss",
    )
    probes = (
        fact.select("IncidentNumber", "DateOfCall", "TimeOfCall")
        .withColumn("CallTs", call_ts)
        .select("IncidentNumber", "CallTs")
    )
    readings = air_quality.select("ReadingDateTime", "AirQualityKey").filter(
        F.col("ReadingDateTime").isNotNull()
    )
    nearest = nearest_within(
        probes,
        readings,
        left_ts="CallTs",
        right_ts="ReadingDateTime",
        tolerance_sec=tolerance_sec,
        left_key="IncidentNumber",
        right_tiebreak="ReadingDateTime",
    ).select("IncidentNumber", "AirQualityKey")
    fact = fact.join(nearest, "IncidentNumber", "left").withColumn(
        "AirQualityKey", F.coalesce("AirQualityKey", F.lit(UNKNOWN))
    )

    fact = fact.join(
        F.broadcast(weather.select(F.col("date").alias("DateOfCall"), "WeatherKey")),
        "DateOfCall",
        "left",
    ).withColumn("WeatherKey", F.coalesce("WeatherKey", F.lit(UNKNOWN)))

    fact = (
        fact.withColumn("YearOfCall", F.year("DateOfCall"))
        .join(
            F.broadcast(
                well_being.select(
                    "WardCode", F.col("Year").alias("YearOfCall"), "WellBeingID"
                )
            ),
            ["WardCode", "YearOfCall"],
            "left",
        )
        .withColumn("WellBeingID", F.coalesce("WellBeingID", F.lit(UNKNOWN)))
    )

    fact = (
        fact.withColumnsRenamed(
            {
                "FirstPumpArriving_AttendanceTime": "FirstPumpAttendanceTime",
                "FirstPumpArriving_DeployedFromStation": "FirstPumpStation",
                "Notional Cost (£)": "NotionalCost",
                "NumStationsWithPumpsAttending": "StationsWithPumpsAttending",
                "NumPumpsAttending": "PumpsAttending",
                "PumpMinutesRounded": "PumpMinutes",
            }
        )
        .withColumn("IncidentStationGround", F.coalesce("IncidentStationGround", F.lit(UNKNOWN)))
        .withColumn("StationsWithPumpsAttending", F.coalesce("StationsWithPumpsAttending", F.lit(0)))
        .withColumn("PumpsAttending", F.coalesce("PumpsAttending", F.lit(0)))
        .withColumn("PumpMinutes", F.coalesce("PumpMinutes", F.lit(0)))
        .withColumn("NotionalCost", F.coalesce("NotionalCost", F.lit(0)))
        .withColumn("NumCalls", F.coalesce("NumCalls", F.lit(1)))
        .withColumn(
            "CostPerCall",
            F.when(
                F.col("NumCalls") > 0,
                (F.col("NotionalCost") / F.col("NumCalls")).cast("int"),
            ).otherwise(F.lit(0)),
        )
    )
    return fact.select(*FACT_COLUMNS)


# ---------------------------------------------------------------------------
# Aggregate marts (reference etl/load/load_sample_aggregates.py)
# ---------------------------------------------------------------------------

def build_marts(fact: DataFrame) -> dict[str, DataFrame]:
    per_month = rollup_mart(
        fact.withColumn("Year", F.year("DateOfCall"))
        .withColumn("Month", F.month("DateOfCall"))
        .withColumn("YearMonth", F.date_format("DateOfCall", "yyyy-MM")),
        keys=["Year", "Month", "YearMonth"],
        measures=[
            F.count("IncidentNumber").alias("IncidentCount"),
            F.sum("NotionalCost").alias("TotalCost"),
            F.round(F.avg("NotionalCost"), 2).alias("AvgCost"),
            F.sum("NumCalls").alias("TotalCalls"),
        ],
        order_by=["Year", "Month"],
    )
    per_ward = rollup_mart(
        fact,
        keys=["WardID"],
        measures=[
            F.count("IncidentNumber").alias("IncidentCount"),
            F.sum("NotionalCost").alias("TotalCost"),
            F.avg("NotionalCost").alias("AvgIncidentCost"),
            F.sum("NumCalls").alias("TotalCalls"),
            F.round(F.avg("FirstPumpAttendanceTime"), 2).alias("AvgResponseTime"),
        ],
        order_by=[F.desc("IncidentCount")],
    )
    types_per_ward = rollup_mart(
        fact,
        keys=["WardID", "IncidentTypeKey"],
        measures=[
            F.count("IncidentNumber").alias("IncidentCount"),
            F.sum("NotionalCost").alias("TotalCost"),
            F.round(F.avg("NotionalCost"), 2).alias("AvgCost"),
        ],
        order_by=["WardID", F.desc("IncidentCount")],
    )
    per_location_type = rollup_mart(
        fact.filter(
            F.col("FirstPumpAttendanceTime").isNotNull() & (F.col("FirstPumpAttendanceTime") > 0)
        ),
        keys=["LocationTypeKey"],
        measures=[
            F.count("IncidentNumber").alias("IncidentCount"),
            F.round(F.avg("FirstPumpAttendanceTime"), 2).alias("AvgResponseTimeMinutes"),
            F.sum("NotionalCost").alias("TotalCost"),
            F.round(F.avg("NotionalCost"), 2).alias("AvgCost"),
            F.sum("PumpsAttending").alias("TotalPumpsAttending"),
            F.round(F.avg("PumpsAttending"), 2).alias("AvgPumpsAttending"),
        ],
        order_by=[F.desc("AvgResponseTimeMinutes")],
    )
    return {
        "per_month": per_month,
        "per_ward": per_ward,
        "types_per_ward": types_per_ward,
        "per_location_type": per_location_type,
    }


# ---------------------------------------------------------------------------
# End-to-end build + warehouse contract
# ---------------------------------------------------------------------------

def run_pipeline(
    spark: SparkSession,
    lfb_raw: DataFrame,
    weather_raw: DataFrame,
    aq_raw: DataFrame,
    wb_raw: DataFrame,
) -> dict[str, DataFrame]:
    """Build the whole warehouse in one logical plan set."""
    clean = cleanse_lfb(lfb_raw)
    tables: dict[str, DataFrame] = {}
    tables["incident_types"] = incident_type_dim(clean)
    tables["location_type"] = location_type_dim(clean)
    tables["ward"] = ward_dim(clean)
    tables["date"] = date_dim(spark, clean)
    tables["weather"] = weather_dim(weather_raw)
    tables["air_quality"] = air_quality_dim(aq_raw)
    tables["well_being"] = well_being_dim(wb_raw)
    tables["lfb_call"] = assemble_fact(
        clean,
        tables["location_type"],
        tables["ward"],
        tables["air_quality"],
        tables["weather"],
        tables["well_being"],
    )
    tables.update(build_marts(tables["lfb_call"]))
    return tables


FK_PAIRS = [
    ("IncidentTypeKey", "incident_types", "IncidentTypeKey"),
    ("LocationTypeKey", "location_type", "LocationTypeKey"),
    ("WardID", "ward", "WardID"),
    ("AirQualityKey", "air_quality", "AirQualityKey"),
    ("WeatherKey", "weather", "WeatherKey"),
    ("WellBeingID", "well_being", "WellBeingID"),
]


def warehouse_checks(tables: dict[str, DataFrame]) -> list[CheckResult]:
    """The reference's post-load contract (etl/checks/): non-empty tables,
    unique dimension keys, referential integrity of all six fact FKs."""
    results: list[CheckResult] = []
    for name, df in tables.items():
        n = df.count()
        results.append(CheckResult(f"non_empty_{name}", n > 0, f"rows={n}"))
    for dim, key in [
        ("incident_types", "IncidentTypeKey"), ("location_type", "LocationTypeKey"),
        ("ward", "WardID"), ("weather", "WeatherKey"),
        ("air_quality", "AirQualityKey"), ("well_being", "WellBeingID"),
        ("date", "Date"),
    ]:
        dups = assert_unique(tables[dim], [key]).count()
        results.append(CheckResult(f"unique_{dim}.{key}", dups == 0, f"dup_keys={dups}"))
    fact = tables["lfb_call"]
    for fk, dim, key in FK_PAIRS:
        orphans = referential_orphans(fact, fk, tables[dim], key).count()
        results.append(CheckResult(f"ref_int_{fk}", orphans == 0, f"orphans={orphans}"))
    return results
