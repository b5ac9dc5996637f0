"""Local re-implementation of the driver's DuckDB-oracle comparison.

The driver runs each ``queries()[name]`` on Spark and ``oracle_sql()[name]``
on DuckDB over the same parquet tables, then compares row-count + schema +
order-insensitive value hash with columns sorted by name. We mirror that
here (conservatively: exact value equality after canonicalization) so every
registered query is verified in CI before the driver ever sees it.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
import re
from dataclasses import dataclass

import duckdb
from pyspark.sql import Row

from tbench_agentic_data_pipeline_spark.catalog import TABLES


def _canon(v: object) -> str:
    """Canonicalize one cell for hashing, tolerant of cross-engine types."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # 12 significant digits: enough to distinguish real differences,
        # forgiving of sum-order ulps the queries already round away.
        return f"{v:.12g}"
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, Row):
        # Row is a tuple subclass, but DuckDB renders the same struct as
        # a dict — canonicalize both through the dict branch or struct
        # cells can never hash equal across engines.
        return _canon(v.asDict(recursive=True))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _hash_rows(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        "|".join(_canon(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


@dataclass
class OracleResult:
    name: str
    ok: bool
    detail: str
    spark_rows: int
    oracle_rows: int


_DUCK_TYPE_NORM = {
    "BIGINT": "bigint", "HUGEINT": "hugeint", "INTEGER": "int",
    "VARCHAR": "string", "DOUBLE": "double", "FLOAT": "float",
    "BOOLEAN": "boolean", "TIMESTAMP": "timestamp", "DECIMAL": "decimal",
    "MAP": "map", "STRUCT": "struct",
}


def _norm_duck_type(t: str) -> str:
    # Preserve the list suffix BEFORE stripping parameters: DuckDB
    # renders list-of-struct as ``STRUCT(...)[]`` — splitting on '(' to
    # a bare ``struct`` would defeat compare()'s endswith('[]') array
    # exemption (r12 ADVICE, latent until a query outputs such a column).
    suffix = ""
    while t.endswith("[]"):
        suffix += "[]"
        t = t[:-2]
    base = t.upper().split("(")[0]
    return _DUCK_TYPE_NORM.get(base, base.lower()) + suffix


def _norm_spark_type(t: str) -> str:
    """Base type only: ``decimal(15,2)`` → ``decimal``, ``map<...>`` →
    ``map`` — the parameterized forms must normalize symmetrically with
    the DuckDB side or a legitimately-agreeing decimal/map/struct column
    reads as a type mismatch. Element agreement is still guarded by the
    value hash."""
    t = t.replace("timestamp_ntz", "timestamp")
    if t.startswith("array"):
        return t  # the array exemption below matches on the full form
    return re.split(r"[(<]", t, 1)[0]


def run_duckdb(sql: str, sf_dir: str) -> tuple[list[str], list[tuple], dict[str, str]]:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        types = {
            r[0]: _norm_duck_type(r[1])
            for r in con.execute(f"DESCRIBE {sql}").fetchall()
        }
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        return cols, cur.fetchall(), types
    finally:
        con.close()


def compare(name: str, spark, fn, sql: str, sf_dir: str) -> OracleResult:
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d_cols, d_rows, d_types = run_duckdb(sql, sf_dir)

    if sorted(s_cols) != sorted(d_cols):
        return OracleResult(
            name, False,
            f"schema mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}",
            len(s_rows), len(d_rows),
        )
    # Column TYPES must align too (the driver's schema compare may check
    # them; DuckDB HUGEINT/INTEGER slips are the usual offenders).
    s_types = {c: _norm_spark_type(t) for c, t in sdf.dtypes}
    type_mism = {
        c: (s_types[c], d_types.get(c))
        for c in s_cols
        if d_types.get(c) != s_types[c]
        and not (s_types[c].startswith("array") and str(d_types.get(c, "")).endswith("[]"))
    }
    if type_mism:
        return OracleResult(
            name, False, f"type mismatch: {type_mism}", len(s_rows), len(d_rows)
        )
    if len(s_rows) != len(d_rows):
        return OracleResult(
            name, False,
            f"row-count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}",
            len(s_rows), len(d_rows),
        )
    hs, hd = _hash_rows(s_cols, s_rows), _hash_rows(d_cols, d_rows)
    if hs != hd:
        # Produce a small diff sample to debug.
        order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
        order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
        set_s = {"|".join(_canon(r[i]) for i in order_s) for r in s_rows}
        set_d = {"|".join(_canon(r[i]) for i in order_d) for r in d_rows}
        only_s = sorted(set_s - set_d)[:3]
        only_d = sorted(set_d - set_s)[:3]
        return OracleResult(
            name, False,
            f"value-hash mismatch; cols={sorted(s_cols)} "
            f"spark-only={only_s} duckdb-only={only_d}",
            len(s_rows), len(d_rows),
        )
    return OracleResult(name, True, "ok", len(s_rows), len(d_rows))
