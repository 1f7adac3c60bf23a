"""Schema contract for the driver-generated testdata tables.

If the driver regenerates /root/testdata with different physical types
(as happened when events.ts changed from TIMESTAMP(NANOS) to
TIMESTAMP(MICROS)), this suite fails loudly in ONE place instead of as
a dozen scattered downstream query errors.

The contract asserts the *post-load* dtypes from ``load_table`` — i.e.
what every operator in the engine actually sees — so it also pins the
loader's normalization (events.ts always arrives as session-tz
TIMESTAMP regardless of the on-disk physical type).
"""

import pytest

from lfb_data_warehouse_spark.sources.testdata import TESTDATA_TABLES, load_table

EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # loader normalizes ns-long / NTZ → timestamp
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}

# orders/lineitem date columns ship as timestamp[us]; Spark reads parquet
# TIMESTAMP(isAdjustedToUTC=false) as TIMESTAMP_NTZ. Loaders other than
# events pass through untouched, so accept either tz flavor there.
_TS_EITHER = {"timestamp", "timestamp_ntz"}


@pytest.mark.parametrize("table", TESTDATA_TABLES)
def test_table_schema_contract(spark, sf_small, table):
    df = load_table(spark, sf_small, table)
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    expected = EXPECTED[table]
    assert list(actual) == list(expected), f"{table}: column order/name drift"
    for col, want in expected.items():
        got = actual[col]
        if want == "timestamp" and table != "events":
            assert got in _TS_EITHER, f"{table}.{col}: {got} not a timestamp"
        else:
            assert got == want, f"{table}.{col}: expected {want}, got {got}"


def test_events_ts_is_tz_timestamp(spark, sf_small):
    """The loader must yield TIMESTAMP (not NTZ, not long) whatever the
    physical encoding — downstream window/as-of ops depend on it."""
    df = load_table(spark, sf_small, "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    # sanity: values are in the generated 2024 range, not 1970 (unit bugs)
    row = df.selectExpr("min(ts) AS lo", "max(ts) AS hi").first()
    assert row.lo.year >= 2020 and row.hi.year <= 2030


def test_all_tables_nonempty(spark, sf_small):
    for t in TESTDATA_TABLES:
        assert load_table(spark, sf_small, t).limit(1).count() == 1, t
