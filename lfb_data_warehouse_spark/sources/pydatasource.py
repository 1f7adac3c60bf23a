"""Custom connectors through Spark 4's Python DataSource API.

The Python DataSource API (SPARK-44076, GA in Spark 4.0) lets a
connector be written in pure Python — schema, partition planning, and
per-partition readers — and registered like any built-in format. This
module ships one production-shaped example: a deterministic calendar
source whose partition planning is real (one input partition per
calendar month, so a multi-year read parallelizes across executors
exactly like a sharded external system would — at warehouse scale the
partitions() hook is where an external store's shard/split listing
goes).

Registered per session with ``spark.dataSource.register`` (idempotent);
read via ``spark.read.format("pycalendar")``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class CalendarDataSource(DataSource):
    """``format("pycalendar")`` — deterministic calendar rows.

    Options: ``year_start`` / ``year_end`` (inclusive, default 2024).
    Schema: day DATE, year INT, month INT, iso_weekday INT (1=Mon),
    is_weekend BOOLEAN. One input partition per (year, month)."""

    @classmethod
    def name(cls) -> str:
        return "pycalendar"

    def schema(self) -> str:
        return "day date, year int, month int, iso_weekday int, is_weekend boolean"

    def reader(self, schema) -> "CalendarReader":
        return CalendarReader(self.options)


class CalendarReader(DataSourceReader):
    def __init__(self, options):
        self.year_start = int(options.get("year_start", 2024))
        self.year_end = int(options.get("year_end", self.year_start))
        if self.year_end < self.year_start:
            raise ValueError("year_end < year_start")

    def partitions(self):
        return [
            InputPartition((y, m))
            for y in range(self.year_start, self.year_end + 1)
            for m in range(1, 13)
        ]

    def read(self, partition):
        import datetime as dt

        y, m = partition.value
        d = dt.date(y, m, 1)
        while d.month == m:
            yield (d, y, m, d.isoweekday(), d.isoweekday() >= 6)
            d += dt.timedelta(days=1)


def calendar(
    spark: SparkSession, year_start: int, year_end: int | None = None
) -> DataFrame:
    """Read the calendar source for an inclusive year range."""
    spark.dataSource.register(CalendarDataSource)
    return (
        spark.read.format("pycalendar")
        .option("year_start", year_start)
        .option("year_end", year_end if year_end is not None else year_start)
        .load()
    )
