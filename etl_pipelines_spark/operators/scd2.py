"""Slowly-changing-dimension type 2: snapshot-to-history application.

The reference mutates mapping tables in place (SURVEY.md §2.10 M2/M3 —
truncate+rebuild and upsert, e.g. the wallet-id mapping choreography);
SCD2 is the warehouse-native extension that KEEPS the history: each key
carries versioned rows with [valid_from, valid_to) intervals and a
current flag, and applying a new snapshot closes changed rows and
inserts new versions instead of overwriting.

One plan, one pass: historical rows pass through untouched; the
current rows full-outer-join the snapshot on the keys (one key
shuffle per side — the same shape as a MERGE; a genuine full outer
cannot broadcast, and a union of filtered arms would make Catalyst
replicate the join per arm); each join row then yields its 1-2 output
rows as an exploded array of structs, so the dimension is scanned and
joined exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    snapshot: DataFrame,
    keys: list[str],
    tracked: list[str],
    effective: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    close_missing: bool = False,
) -> DataFrame:
    """Apply `snapshot` (one row per key, observed at date/timestamp
    string `effective`) to the SCD2 table `dim`, returning the new
    history. `dim` columns: keys + tracked + valid_from + valid_to
    (NULL = current). Outcomes:

    - new key            -> insert [effective, NULL)
    - changed tracked    -> close current at `effective`, insert new
    - unchanged          -> current row untouched
    - key missing from snapshot -> closed at `effective` iff
      `close_missing` (hard-delete tracking), else left open
    - already-closed history rows always pass through untouched

    A snapshot replayed twice is a no-op (idempotent), and applying
    snapshots S1 then S2 equals applying S2 to the S1 result — the
    incremental-build property the lifecycle tests pin.
    """
    # effective time rides in the dim's own validity types, so string
    # and date/timestamp validity columns both union cleanly
    ts = F.lit(effective).cast(dim.schema[valid_to].dataType)
    hist = dim.filter(F.col(valid_to).isNotNull())
    cur = dim.filter(F.col(valid_to).isNull())

    snap = snapshot.select(
        *[F.col(k).alias(f"_s_{k}") for k in keys],
        *[F.col(c).alias(f"_s_{c}") for c in tracked],
        F.lit(True).alias("_in_snap"),
    )
    # presence markers, not key-null sniffing: a NULL-keyed dim row
    # must fall into the missing-from-snapshot arm (kept/closed), not
    # be rewritten as an all-NULL insert
    cur = cur.withColumn("_in_dim", F.lit(True))
    cond = [F.col(k).eqNullSafe(F.col(f"_s_{k}")) for k in keys]
    j = cur.join(snap, cond, "full_outer")

    in_dim = F.coalesce(F.col("_in_dim"), F.lit(False))
    in_snap = F.coalesce(F.col("_in_snap"), F.lit(False))
    changed = F.coalesce(
        ~F.struct(*[F.col(c) for c in tracked]).eqNullSafe(
            F.struct(*[F.col(f"_s_{c}") for c in tracked])
        ),
        F.lit(False),
    )

    # each join row yields 1-2 output rows, built as an array of
    # structs and exploded ONCE — a union of filtered arms would make
    # Catalyst replicate the join per arm (no cross-arm subtree reuse),
    # i.e. re-scan the dimension once per outcome at scale
    ts_from = F.lit(effective).cast(dim.schema[valid_from].dataType)
    null_to = F.lit(None).cast(dim.schema[valid_to].dataType)

    def row(key_src, trk_src, vf, vt):
        return F.struct(
            *[F.col(key_src(k)).alias(k) for k in keys],
            *[F.col(trk_src(c)).alias(c) for c in tracked],
            vf.alias(valid_from),
            vt.alias(valid_to),
        )

    old = lambda c: c  # noqa: E731
    new = lambda c: f"_s_{c}"  # noqa: E731
    cur_row = row(old, old, F.col(valid_from), F.col(valid_to))
    closed_row = row(old, old, F.col(valid_from), ts)
    opened_row = row(new, new, ts_from, null_to)

    out_rows = (
        F.when(in_dim & in_snap & changed, F.array(closed_row, opened_row))
        .when(in_dim & in_snap, F.array(cur_row))
        .when(
            in_dim,  # key missing from the snapshot
            F.array(closed_row) if close_missing else F.array(cur_row),
        )
        .otherwise(F.array(opened_row))  # new key
    )
    applied = j.select(F.explode(out_rows).alias("_r")).select("_r.*")
    return hist.select(*keys, *tracked, valid_from, valid_to).unionByName(
        applied
    )


def scd2_init(
    snapshot: DataFrame,
    keys: list[str],
    tracked: list[str],
    effective: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Bootstrap an SCD2 table from a first snapshot: every row
    current as of `effective`."""
    return snapshot.select(
        *keys,
        *tracked,
        F.lit(effective).alias(valid_from),
        F.lit(None).cast("string").alias(valid_to),
    )


def scd2_at(
    dim: DataFrame,
    as_of: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time view: the version of each key valid at `as_of`
    ([valid_from, valid_to) semantics) — a pair of pushdown-friendly
    range predicates, no window needed because versions never overlap."""
    return dim.filter(
        (F.col(valid_from) <= F.lit(as_of))
        & (F.col(valid_to).isNull() | (F.col(valid_to) > F.lit(as_of)))
    )


def scd2_from_events(
    events: DataFrame,
    keys: list[str],
    tracked: list[str],
    ts_col: str,
    delete_col: str | None = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Build the full SCD2 history directly from a CDC change log:
    each change row becomes a version valid [its ts, next change's ts)
    per key — ONE lead() window on the key partition, no join at all
    (the change log IS the history; snapshot-diffing via scd2_apply is
    only needed when upstream cannot emit changes).

    `delete_col` (boolean) marks tombstones: a delete bounds the
    previous version (its ts still feeds lead) but opens no version of
    its own — the filter runs AFTER the window so the bound survives.
    Rows per key must have distinct `ts_col` values (a real CDC log's
    ordering key; enforce upstream with dedupe_keep_first otherwise).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(ts_col)
    versions = events.withColumn("_vt", F.lead(ts_col).over(w))
    if delete_col is not None:
        versions = versions.filter(~F.col(delete_col))
    return versions.select(
        *keys,
        *tracked,
        F.col(ts_col).alias(valid_from),
        F.col("_vt").alias(valid_to),
    )
