"""Replicates the driver's correctness gate locally: run the Spark query and
the DuckDB oracle on the same parquet, compare row count, schema (column
names), and an order-insensitive value comparison."""

from __future__ import annotations

import datetime
import math


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # absorb -0.0 and representation noise beyond round() already applied
        return round(v, 9) + 0.0
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def compare(spark, duck, fn, sql, sf_dir):
    sdf = fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    rel = duck.sql(sql)
    dcols = rel.columns
    drows = rel.fetchall()
    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols), (
        f"schema mismatch: spark={sorted(scols)} duck={sorted(dcols)}"
    )
    assert len(srows) == len(drows), f"rowcount: spark={len(srows)} duck={len(drows)}"
    sset = rows_to_multiset([c.lower() for c in scols], [tuple(r) for r in srows])
    dset = rows_to_multiset([c.lower() for c in dcols], drows)
    mism = [(a, b) for a, b in zip(sset, dset) if a != b]
    assert not mism, f"value mismatch ({len(mism)} rows), first: {mism[0]}"
    return len(srows)
