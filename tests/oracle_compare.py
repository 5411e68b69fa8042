"""Shared Spark-vs-DuckDB comparison mimicking the driver's correctness
gate: row count + column names + order-insensitive value comparison
(columns sorted by name, rows sorted)."""

from __future__ import annotations

import hashlib
import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str):
    """Views over the sf tables; handles both single-file parquet (the
    driver's testdata layout) and Spark-written parquet directories."""
    import os

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            )
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
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


def driver_canon_hash(pdf) -> str:
    """The external driver's canonicalization: columns sorted by name, rows
    sorted over all columns, every value stringified, sha256 of the body.
    Crashes on unhashable cells (lists) exactly like the driver does —
    that crash IS the signal a query's output shape is driver-unsafe."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    body = "\n".join(
        "|".join(str(v) for v in row) for row in pdf.itertuples(index=False)
    )
    return hashlib.sha256(body.encode()).hexdigest()


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
    if not problems:
        # Driver parity: the external gate compares via pandas (toPandas /
        # fetchdf), where engine-type artifacts invisible to python-object
        # comparison surface — DuckDB HUGEINT materializes as float64
        # ("5.0" vs "5"), list cells crash sort_values. w9/arr2/f13/mm2
        # were all driver-red while this python-object check was green.
        # This deliberately RE-EXECUTES both engines: only toPandas/fetchdf
        # materialization reproduces those dtype artifacts (building a
        # DataFrame from the already-fetched python objects would not), so
        # the battery pays ~2x per query for driver fidelity.
        con = duck_connection(sf_dir)
        try:
            s_hash = driver_canon_hash(sdf.toPandas())
            d_hash = driver_canon_hash(con.execute(sql).fetchdf())
        except Exception as e:
            problems.append(f"driver canonicalizer would crash: {e!r}")
        else:
            if s_hash != d_hash:
                problems.append(
                    "driver-canon hash mismatch (values equal object-wise; "
                    "a pandas dtype artifact — check integer aggregates for "
                    "missing CASTs)"
                )
        finally:
            con.close()
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
