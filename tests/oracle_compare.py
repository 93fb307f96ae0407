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


def _dtypes_compatible(spark_s: pd.Series, oracle_s: pd.Series) -> bool:
    """Strict dtype check mirroring the driver's type-sensitive value hash.

    Exact dtype equality, except pairs the driver demonstrably accepts
    (proven by green rows in CORRECTNESS_r01.json):
      - datetime64 of any unit/tz on both sides (ns vs us narrowing);
      - Spark date as object-of-datetime.date vs DuckDB datetime64;
      - object columns whose elements are the same Python type
        (str/Decimal/list payloads).
    This catches DuckDB HUGEINT (-> float64) vs Spark BIGINT (-> int64),
    the class of bug behind the round-1 ``sessionize`` hash mismatch.
    """
    import datetime

    sd, od = spark_s.dtype, oracle_s.dtype
    if sd == od and sd != object:
        return True
    s_dt = str(sd).startswith("datetime64") or isinstance(sd, pd.DatetimeTZDtype)
    o_dt = str(od).startswith("datetime64") or isinstance(od, pd.DatetimeTZDtype)
    if s_dt and o_dt:
        return True

    def first_non_null(s: pd.Series):
        nn = s.dropna()
        return nn.iloc[0] if len(nn) else None

    sv, ov = first_non_null(spark_s), first_non_null(oracle_s)
    if sv is None or ov is None:
        return True  # an all-null side: no values to distinguish
    if sd == object and isinstance(sv, datetime.date) and o_dt:
        return True
    if sd == object and od == object:
        # list/array payloads are their own kind — asarray on ragged
        # nested lists raises, and a flat int list would masquerade as
        # kind 'i' against a scalar-int column
        s_seq = isinstance(sv, (list, tuple, np.ndarray))
        o_seq = isinstance(ov, (list, tuple, np.ndarray))
        if s_seq or o_seq:
            return s_seq == o_seq
        # numpy scalar vs plain-python of the same kind counts as same type
        try:
            return np.asarray([sv]).dtype.kind == np.asarray([ov]).dtype.kind
        except (ValueError, TypeError):
            return type(sv).__name__ == type(ov).__name__
    return False


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    )
    for c in spark_pdf.columns:
        assert _dtypes_compatible(spark_pdf[c], oracle_pdf[c]), (
            f"{name}.{c}: spark dtype {spark_pdf[c].dtype} incompatible with "
            f"oracle dtype {oracle_pdf[c].dtype} — the driver's value hash "
            f"distinguishes these (cast the oracle, e.g. DuckDB SUM(int) is "
            f"HUGEINT -> float64; wrap in CAST(... AS BIGINT))"
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
    # queries that persist intermediates (e.g. the LSH shingle cache)
    # must not leak executor memory into the next comparison
    spark.catalog.clearCache()
    oracle_pdf = con.execute(oracle).df()
    compare_frames(spark_pdf, oracle_pdf, name)
