"""Column DEFAULT values (D76, Delta ``allowColumnDefaults`` writer
feature): SET DEFAULT stamps ``CURRENT_DEFAULT`` in the field metadata
and upgrades the writer protocol; appends that OMIT the column
materialize the default (cast to the declared type) while provided
values stay untouched; DROP DEFAULT restores strict schema
conformance; the expression must be constant-foldable (column
references refuse loudly)."""

from __future__ import annotations

import pytest

from delta_lake_health_spark.sources import delta_writer
from delta_lake_health_spark.sources.delta_log import DeltaLog


def _table(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, tag string, v double"
    )
    delta_writer.write(spark, df, path)
    return path


def test_set_default_fills_omitted_column(spark, tmp_path):
    path = _table(spark, tmp_path)
    delta_writer.set_column_default(spark, path, "tag", "'unknown'")
    delta_writer.set_column_default(spark, path, "v", "0.0")
    # batch omits both defaulted columns
    delta_writer.write(
        spark,
        spark.createDataFrame([(3,), (4,)], "id long"),
        path,
        mode="append",
    )
    rows = {
        r.id: (r.tag, r.v)
        for r in DeltaLog(spark, path).snapshot().collect()
    }
    assert rows[3] == ("unknown", 0.0) and rows[4] == ("unknown", 0.0)
    assert rows[1] == ("a", 1.5)  # pre-default data untouched
    # a batch that PROVIDES the column keeps its values
    delta_writer.write(
        spark,
        spark.createDataFrame(
            [(5, "explicit", 9.0)], "id long, tag string, v double"
        ),
        path,
        mode="append",
    )
    rows = {
        r.id: (r.tag, r.v)
        for r in DeltaLog(spark, path).snapshot().collect()
    }
    assert rows[5] == ("explicit", 9.0)


def test_default_casts_to_declared_type(spark, tmp_path):
    path = _table(spark, tmp_path)
    delta_writer.set_column_default(spark, path, "v", "7")  # int literal
    delta_writer.write(
        spark,
        spark.createDataFrame([(9, "x")], "id long, tag string"),
        path,
        mode="append",
    )
    row = (
        DeltaLog(spark, path).snapshot().where("id = 9").collect()[0]
    )
    assert row.v == 7.0 and isinstance(row.v, float)


def test_protocol_upgrade_and_metadata(spark, tmp_path):
    path = _table(spark, tmp_path)
    delta_writer.set_column_default(spark, path, "tag", "'d'")
    log = DeltaLog(spark, path)
    p = log.protocol()
    assert p["minWriterVersion"] == 7
    assert "allowColumnDefaults" in p.get("writerFeatures", [])
    field = next(
        f
        for f in log.metadata()["schema"]["fields"]
        if f["name"] == "tag"
    )
    assert field["metadata"]["CURRENT_DEFAULT"] == "'d'"
    # idempotent re-set: no second protocol action needed
    delta_writer.set_column_default(spark, path, "tag", "'e'")
    field = next(
        f
        for f in DeltaLog(spark, path).metadata()["schema"]["fields"]
        if f["name"] == "tag"
    )
    assert field["metadata"]["CURRENT_DEFAULT"] == "'e'"


def test_drop_default_restores_conformance(spark, tmp_path):
    path = _table(spark, tmp_path)
    delta_writer.set_column_default(spark, path, "tag", "'d'")
    delta_writer.clear_column_default(spark, path, "tag")
    with pytest.raises(ValueError, match="schema differs"):
        delta_writer.write(
            spark,
            spark.createDataFrame([(3, 3.0)], "id long, v double"),
            path,
            mode="append",
        )
    with pytest.raises(ValueError, match="no default"):
        delta_writer.clear_column_default(spark, path, "tag")


def test_non_constant_default_refused(spark, tmp_path):
    path = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="constant-foldable"):
        delta_writer.set_column_default(spark, path, "tag", "id + 1")
    with pytest.raises(ValueError, match="not in table schema"):
        delta_writer.set_column_default(spark, path, "nope", "'x'")


def test_nondeterministic_default_refused(spark, tmp_path):
    """ADVICE r12: rand()/uuid()/current_timestamp() pass a standalone
    SELECT but differ per batch and per replayed write — a 'constant'
    default must be deterministic too."""
    path = _table(spark, tmp_path)
    for expr in (
        "rand()",
        "uuid()",
        "current_timestamp()",
        "cast(rand(42) * 10 as double)",
        "concat('t-', uuid())",
        # niladic forms Spark accepts WITHOUT parens (r13 review: the
        # paren-required screen let these through, and double-eval
        # can't catch a value that only changes at midnight)
        "current_date",
        "cast(current_timestamp as string)",
    ):
        with pytest.raises(ValueError, match="deterministic"):
            delta_writer.set_column_default(spark, path, "tag", expr)
    # deterministic function CALLS still pass (the screen is not a
    # blanket function ban), and the words inside STRING LITERALS are
    # ignored (r13 review: literals are blanked before the screen)
    delta_writer.set_column_default(
        spark, path, "tag", "concat('current_date: ', 'now()')"
    )
    # escape-aware blanking (r13 third-pass review): an escaped
    # apostrophe inside a literal must not unbalance the pairing
    delta_writer.set_column_default(
        spark, path, "tag", r"'don\'t use now() here'"
    )
    # ...and a genuine niladic BETWEEN literals is still caught
    with pytest.raises(ValueError, match="deterministic"):
        delta_writer.set_column_default(
            spark, path, "tag", "concat('a', current_date, 'b')"
        )
    delta_writer.set_column_default(spark, path, "tag", "upper('ab')")
    field = next(
        f
        for f in DeltaLog(spark, path).metadata()["schema"]["fields"]
        if f["name"] == "tag"
    )
    assert field["metadata"]["CURRENT_DEFAULT"] == "upper('ab')"


def test_non_primitive_default_refused(spark, tmp_path):
    """ADVICE r12: _fill_default_columns only materializes primitive
    targets; stamping a default on a struct column would be accepted
    then silently never applied — refuse at SET DEFAULT time."""
    path = str(tmp_path / "t")
    df = spark.sql(
        "SELECT 1L AS id, named_struct('a', 1, 'b', 'x') AS s,"
        " array(1, 2) AS arr"
    )
    delta_writer.write(spark, df, path)
    with pytest.raises(ValueError, match="non-primitive"):
        delta_writer.set_column_default(
            spark, path, "s", "named_struct('a', 0, 'b', '')"
        )
    with pytest.raises(ValueError, match="non-primitive"):
        delta_writer.set_column_default(spark, path, "arr", "array(0)")
    # primitive sibling still accepted on the same table
    delta_writer.set_column_default(spark, path, "id", "0")


def test_default_composes_with_generated_columns(spark, tmp_path):
    """A generation expression may reference a defaulted column the
    batch omitted — defaults materialize first."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10.0, 20.0)], "id long, v double, v2 double"
    )
    delta_writer.write(spark, df, path)
    delta_writer.set_column_default(spark, path, "v", "10.0")
    delta_writer.set_generated_column(spark, path, "v2", "v * 2")
    delta_writer.write(
        spark,
        spark.createDataFrame([(2,)], "id long"),
        path,
        mode="append",
    )
    row = DeltaLog(spark, path).snapshot().where("id = 2").collect()[0]
    assert (row.v, row.v2) == (10.0, 20.0)
