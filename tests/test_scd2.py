"""SCD2 lifecycle: init -> apply -> point-in-time reads, idempotence,
and the incremental-build property (S1 then S2 == S2 onto S1-result)."""

import pytest
from pyspark.sql import functions as F

from etl_pipelines_spark.operators.scd2 import scd2_apply, scd2_at, scd2_init


def snap(spark, rows):
    return spark.createDataFrame(rows, "id long, name string, price double")


@pytest.fixture(scope="module")
def dims(spark):
    s1 = snap(spark, [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)])
    s2 = snap(spark, [(1, "a", 10.0), (2, "b2", 20.0), (4, "d", 40.0)])
    dim1 = scd2_init(s1, ["id"], ["name", "price"], "2024-01-01")
    dim2 = scd2_apply(dim1, s2, ["id"], ["name", "price"], "2024-02-01")
    return s1, s2, dim1, dim2


def key(r):
    return (r["id"], r["name"], r["price"], r["valid_from"], r["valid_to"])


def test_apply_outcomes(dims):
    _, _, _, dim2 = dims
    got = sorted(key(r) for r in dim2.collect())
    assert got == [
        (1, "a", 10.0, "2024-01-01", None),  # unchanged -> untouched
        (2, "b", 20.0, "2024-01-01", "2024-02-01"),  # changed -> closed
        (2, "b2", 20.0, "2024-02-01", None),  # ...and re-opened
        (3, "c", 30.0, "2024-01-01", None),  # missing -> left open
        (4, "d", 40.0, "2024-02-01", None),  # new key -> inserted
    ]


def test_close_missing(dims):
    _, s2, dim1, _ = dims
    closed = scd2_apply(
        dim1, s2, ["id"], ["name", "price"], "2024-02-01", close_missing=True
    )
    r3 = [r for r in closed.collect() if r["id"] == 3]
    assert [(r["valid_from"], r["valid_to"]) for r in r3] == [
        ("2024-01-01", "2024-02-01")
    ]


def test_replay_is_idempotent(dims):
    _, s2, _, dim2 = dims
    again = scd2_apply(dim2, s2, ["id"], ["name", "price"], "2024-03-01")
    assert sorted(key(r) for r in again.collect()) == sorted(
        key(r) for r in dim2.collect()
    )


def test_point_in_time_views(dims):
    _, _, _, dim2 = dims
    jan = {r["id"]: r["name"] for r in scd2_at(dim2, "2024-01-15").collect()}
    feb = {r["id"]: r["name"] for r in scd2_at(dim2, "2024-02-15").collect()}
    assert jan == {1: "a", 2: "b", 3: "c"}
    assert feb == {1: "a", 2: "b2", 3: "c", 4: "d"}


def test_incremental_equals_direct(spark, dims):
    # applying S2 then S3 == applying S3 to the S2 result
    _, s2, dim1, dim2 = dims
    s3 = snap(spark, [(1, "a9", 11.0), (2, "b2", 20.0), (4, "d", 44.0)])
    inc = scd2_apply(dim2, s3, ["id"], ["name", "price"], "2024-03-01")
    # same history rebuilt from scratch
    direct = scd2_apply(
        scd2_apply(dim1, s2, ["id"], ["name", "price"], "2024-02-01"),
        s3,
        ["id"],
        ["name", "price"],
        "2024-03-01",
    )
    assert sorted(key(r) for r in inc.collect()) == sorted(
        key(r) for r in direct.collect()
    )
    # versions per key never overlap and at most one is open
    rows = inc.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append((r["valid_from"], r["valid_to"]))
    for spans in by_id.values():
        opens = [s for s in spans if s[1] is None]
        assert len(opens) <= 1
        closed = sorted(s for s in spans if s[1] is not None)
        for (f1, t1), (f2, _) in zip(closed, closed[1:] + opens):
            assert t1 <= f2


def test_null_keyed_rows_survive(spark):
    """A NULL-keyed current row must fall into the missing-from-
    snapshot arm (kept or closed), never be rewritten as an all-NULL
    insert; a NULL-keyed snapshot row matches it null-safely."""
    from pyspark.sql import functions as F

    dim = spark.createDataFrame(
        [(None, "x", 1.0, "2024-01-01", None), (1, "a", 2.0, "2024-01-01", None)],
        "id long, name string, price double, valid_from string, valid_to string",
    )
    s = snap(spark, [(1, "a", 2.0)])
    out = scd2_apply(dim, s, ["id"], ["name", "price"], "2024-02-01")
    null_rows = [r for r in out.collect() if r["id"] is None]
    assert [(r["name"], r["price"], r["valid_to"]) for r in null_rows] == [
        ("x", 1.0, None)
    ]
    # null-safe match: a NULL-keyed snapshot row updates the NULL-keyed
    # current row instead of inserting a duplicate NULL entity
    s2 = spark.createDataFrame(
        [(None, "x2", 9.0)], "id long, name string, price double"
    )
    out2 = scd2_apply(dim, s2, ["id"], ["name", "price"], "2024-02-01",
                      close_missing=False)
    nulls = sorted(
        (r["name"], r["valid_from"], r["valid_to"])
        for r in out2.collect() if r["id"] is None
    )
    assert nulls == [
        ("x", "2024-01-01", "2024-02-01"), ("x2", "2024-02-01", None)
    ]


def test_scd2_from_events_tombstones_bound_versions(spark):
    from etl_pipelines_spark.operators.scd2 import scd2_from_events

    log = spark.createDataFrame(
        [
            (1, "2024-01-01", 10.0, False),
            (1, "2024-02-01", 20.0, False),
            (1, "2024-03-01", 0.0, True),   # tombstone: closes v2, opens none
            (1, "2024-04-01", 30.0, False),  # re-created after the delete
            (2, "2024-01-15", 5.0, False),
        ],
        "id long, ts string, price double, is_delete boolean",
    )
    out = scd2_from_events(log, ["id"], ["price"], "ts", delete_col="is_delete")
    got = sorted((r["id"], r["price"], r["valid_from"], r["valid_to"]) for r in out.collect())
    assert got == [
        (1, 10.0, "2024-01-01", "2024-02-01"),
        (1, 20.0, "2024-02-01", "2024-03-01"),  # bounded by the tombstone
        (1, 30.0, "2024-04-01", None),
        (2, 5.0, "2024-01-15", None),
    ]
