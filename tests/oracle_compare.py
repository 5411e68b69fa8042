"""Shared Spark-vs-DuckDB comparison mimicking the driver's correctness
gate: row count + column names + order-insensitive value comparison
(columns sorted by name, rows sorted)."""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, (int, bool, str, bytes)):
        return v
    return str(v)


def normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda tup: tuple((x is None, str(type(x)), str(x)) for x in tup))
    return [c for c in sorted(cols)], out


def compare(spark, sf_dir, spark_fn, sql, float_tol=0.0):
    sdf = spark_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    con = duck_connection(sf_dir)
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    con.close()

    sc, sr = normalize_rows(s_cols, s_rows)
    dc, dr = normalize_rows(d_cols, d_rows)
    problems = []
    if sc != dc:
        problems.append(f"columns differ: spark={sc} duck={dc}")
    if len(sr) != len(dr):
        problems.append(f"row counts differ: spark={len(sr)} duck={len(dr)}")
    if not problems:
        for i, (a, b) in enumerate(zip(sr, dr)):
            if a != b and not _rows_close(a, b, float_tol):
                problems.append(f"row {i} differs:\n  spark={a}\n  duck ={b}")
                if len(problems) > 4:
                    break
    return problems


def _rows_close(a, b, tol):
    if tol <= 0 or len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x == y:
            continue
        if isinstance(x, float) and isinstance(y, float) and abs(x - y) <= tol * max(1.0, abs(x), abs(y)):
            continue
        return False
    return True
