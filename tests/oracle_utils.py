"""Local mimic of the driver's DuckDB-oracle comparison.

Compares a Spark DataFrame against a DuckDB SQL result on the same parquet
tables: row count, column-name set, and an order-insensitive value hash with
columns sorted by name — the same contract as CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pyarrow as pa

from s3bigdatasync_spark.views import BASE_TABLES

SF_DIR_DEFAULT = "/root/testdata/sf0.01"


def duck_connect(sf_dir: str = SF_DIR_DEFAULT) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in BASE_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _norm(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _canon(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


def oracle_type_violations(schema: "pa.Schema") -> list[tuple[str, str]]:
    """Columns whose Arrow type a type-sensitive hasher would see differently
    from Spark's int64/float64/etc. — DuckDB silently widens sums of BIGINT
    to HUGEINT (decimal128 over Arrow), which `fetchall()` coerces back to
    Python int and hides. The driver's hasher is type-sensitive: decimal128
    vs int64 reads as a wrong answer even when every value is equal (the
    r2/r3 `compaction_plan.bin` mismatch). Flag any decimal or >64-bit
    integer output column so the class is caught in-repo."""
    bad = []
    for field in schema:
        t = field.type
        if pa.types.is_decimal(t) or (pa.types.is_integer(t) and t.bit_width > 64):
            bad.append((field.name, str(t)))
    return bad


def compare(spark_df, oracle_sql: str, sf_dir: str = SF_DIR_DEFAULT) -> dict:
    """Return a dict with match booleans and diagnostics."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    con = duck_connect(sf_dir)
    tbl = con.execute(oracle_sql).fetch_arrow_table()
    con.close()
    d_cols = list(tbl.schema.names)
    d_rows = list(zip(*(tbl.column(i).to_pylist() for i in range(tbl.num_columns)))) if tbl.num_columns else []
    type_violations = oracle_type_violations(tbl.schema)

    out: dict[str, Any] = {
        "rows_spark": len(s_rows),
        "rows_oracle": len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_oracle": sorted(d_cols),
    }
    out["count_match"] = len(s_rows) == len(d_rows)
    out["schema_match"] = sorted(s_cols) == sorted(d_cols)
    out["type_violations"] = type_violations
    out["type_ok"] = not type_violations
    if out["count_match"] and out["schema_match"]:
        cs, cd = _canon(s_rows, s_cols), _canon(d_rows, d_cols)
        out["value_match"] = cs == cd
        if not out["value_match"]:
            diffs = [(a, b) for a, b in zip(cs, cd) if a != b]
            out["first_diffs"] = diffs[:5]
    else:
        out["value_match"] = False
    out["ok"] = (
        out["count_match"] and out["schema_match"] and out["value_match"] and out["type_ok"]
    )
    return out


def assert_match(spark_df, oracle_sql: str, sf_dir: str = SF_DIR_DEFAULT) -> None:
    r = compare(spark_df, oracle_sql, sf_dir)
    assert r["ok"], {k: v for k, v in r.items() if k != "first_diffs"} | {
        "first_diffs": r.get("first_diffs", [])[:3]
    }
