"""Local mimic of the driver's DuckDB-oracle comparison.

Sorts columns by name, sorts rows, and asserts exact value equality
(the decimal-routed aggregates in functions/oracle.py are designed to
make even float results bit-identical across engines).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.schemas import (
    TESTDATA_TABLES,
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        s = pdf[c]
        if isinstance(s.dtype, pd.DatetimeTZDtype):
            pdf[c] = s.dt.tz_localize(None)
        elif s.dtype == object and len(s) and not isinstance(s.iloc[0], str):
            import datetime

            if isinstance(s.iloc[0], (datetime.date, datetime.datetime)):
                pdf[c] = pd.to_datetime(s)
    sort_cols = [c for c in pdf.columns]
    pdf = pdf.sort_values(by=sort_cols, na_position="first").reset_index(drop=True)
    return pdf


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    )
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            af = av.astype(float)
            bf = bv.astype(float)
            both_nan = np.isnan(af) & np.isnan(bf)
            eq = (af == bf) | both_nan
            if not eq.all():
                idx = np.where(~eq)[0][:5]
                diffs = [(int(i), af[i], bf[i]) for i in idx]
                raise AssertionError(
                    f"{name}.{c}: {int((~eq).sum())} float mismatches, e.g. {diffs}"
                )
        else:
            eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
            if not np.asarray(eq).all():
                idx = np.where(~np.asarray(eq))[0][:5]
                diffs = [(int(i), av[i], bv[i]) for i in idx]
                raise AssertionError(
                    f"{name}.{c}: {int((~np.asarray(eq)).sum())} mismatches, e.g. {diffs}"
                )


def run_and_compare(spark, con, query_fn, oracle: str, name: str, sf_dir: str) -> None:
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    oracle_pdf = con.execute(oracle).df()
    compare_frames(spark_pdf, oracle_pdf, name)
