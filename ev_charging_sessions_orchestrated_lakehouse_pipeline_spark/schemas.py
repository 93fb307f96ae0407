"""Typed schemas for the medallion layers and the driver test tables.

The reference uses a three-stage schema system (SURVEY.md §1.3):
inferred at bronze, cast-normalized at silver
(jobs/ev_sessions_silver_etl_clean.py:66-80), declared DDL at gold
(jobs/ev_sessions_gold_etl.py:127-150). We declare all three
explicitly; inference stays available for ad-hoc bronze ingest but is
never the production path (an explicit StructType avoids the extra
sampling pass over 100 TB of input).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Bronze: raw EV sessions CSV, 24 columns
# (data-samples/station_data_dataverse.csv:1). `created`/`ended` are
# dirty strings ("00YY-..."), `distance` is double-or-"NA" so it must
# be read as string — matching what inferSchema produces on the sample.
# ---------------------------------------------------------------------------
EV_BRONZE_SCHEMA = T.StructType(
    [
        T.StructField("sessionId", T.LongType()),
        T.StructField("kwhTotal", T.DoubleType()),
        T.StructField("dollars", T.DoubleType()),
        T.StructField("created", T.StringType()),
        T.StructField("ended", T.StringType()),
        T.StructField("startTime", T.IntegerType()),
        T.StructField("endTime", T.IntegerType()),
        T.StructField("chargeTimeHrs", T.DoubleType()),
        T.StructField("weekday", T.StringType()),
        T.StructField("platform", T.StringType()),
        T.StructField("distance", T.StringType()),
        T.StructField("userId", T.LongType()),
        T.StructField("stationId", T.LongType()),
        T.StructField("locationId", T.LongType()),
        T.StructField("managerVehicle", T.IntegerType()),
        T.StructField("facilityType", T.IntegerType()),
        T.StructField("Mon", T.IntegerType()),
        T.StructField("Tues", T.IntegerType()),
        T.StructField("Wed", T.IntegerType()),
        T.StructField("Thurs", T.IntegerType()),
        T.StructField("Fri", T.IntegerType()),
        T.StructField("Sat", T.IntegerType()),
        T.StructField("Sun", T.IntegerType()),
        T.StructField("reportedZip", T.IntegerType()),
    ]
)

# Columns the silver job drops (jobs/ev_sessions_silver_etl_clean.py:63)
EV_SILVER_DROP_COLS = [
    "Mon",
    "Tues",
    "Wed",
    "Thurs",
    "Fri",
    "Sat",
    "Sun",
    "reportedZip",
    "startTime",
    "endTime",
]

# Silver cast plan (jobs/ev_sessions_silver_etl_clean.py:66-80):
# ids -> string, measures -> double (non-ANSI: "NA" -> null).
EV_SILVER_CASTS: dict[str, str] = {
    "sessionId": "string",
    "userId": "string",
    "stationId": "string",
    "locationId": "string",
    "kwhTotal": "double",
    "dollars": "double",
    "distance": "double",
    "chargeTimeHrs": "double",
    "facilityType": "string",
    "platform": "string",
    "weekday": "string",
    "created": "string",
    "ended": "string",
}

# Silver output schema, 15 cols as actually written (FIXTURES.md A2).
EV_SILVER_SCHEMA = T.StructType(
    [
        T.StructField("sessionId", T.StringType()),
        T.StructField("userId", T.StringType()),
        T.StructField("stationId", T.StringType()),
        T.StructField("locationId", T.StringType()),
        T.StructField("kwhTotal", T.DoubleType()),
        T.StructField("dollars", T.DoubleType()),
        T.StructField("distance", T.DoubleType()),
        T.StructField("chargeTimeHrs", T.DoubleType()),
        T.StructField("facilityType", T.StringType()),
        T.StructField("platform", T.StringType()),
        T.StructField("weekday", T.StringType()),
        T.StructField("created", T.TimestampType()),
        T.StructField("ended", T.TimestampType()),
        T.StructField("managerVehicle", T.IntegerType()),
        T.StructField("event_date", T.DateType()),
    ]
)

QUARANTINE_REASON_COL = "quarantine_reason"

# Gold fact table: silver minus managerVehicle, plus derived metrics
# (jobs/ev_sessions_gold_etl.py:83-87,106-118,127-150).
EV_GOLD_SELECT_COLS = [
    "sessionId",
    "userId",
    "stationId",
    "locationId",
    "kwhTotal",
    "dollars",
    "distance",
    "chargeTimeHrs",
    "facilityType",
    "platform",
    "weekday",
    "created",
    "ended",
    "event_date",
]

EV_GOLD_DERIVED_COLS = ["session_duration_minutes", "avg_cost_per_kwh"]

# ---------------------------------------------------------------------------
# Driver-generated operator-test tables (FIXTURES.md §B) — one parquet
# per table under /root/testdata/sf{0.001,0.01,0.1}/.
# ---------------------------------------------------------------------------
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
