"""Slowly-changing-dimension type 2: snapshot-to-history application.

The reference mutates mapping tables in place (SURVEY.md §2.10 M2/M3 —
truncate+rebuild and upsert, e.g. the wallet-id mapping choreography);
SCD2 is the warehouse-native extension that KEEPS the history: each key
carries versioned rows with [valid_from, valid_to) intervals and a
current flag, and applying a new snapshot closes changed rows and
inserts new versions instead of overwriting.

One plan, one shuffle: historical rows pass through untouched; the
current rows full-outer-join the snapshot on the keys (the snapshot
side broadcasts when small — the typical daily-delta case — so the
dimension never shuffles); each join outcome maps to union arms that
are all cheap projections of that single join.
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
    )
    cond = [F.col(k) == F.col(f"_s_{k}") for k in keys]
    j = cur.join(F.broadcast(snap), cond, "full_outer")

    in_dim = F.col(keys[0]).isNotNull()
    in_snap = F.col(f"_s_{keys[0]}").isNotNull()
    changed = F.coalesce(
        ~F.struct(*[F.col(c) for c in tracked]).eqNullSafe(
            F.struct(*[F.col(f"_s_{c}") for c in tracked])
        ),
        F.lit(False),
    )

    # arm 1: surviving current rows (unchanged, or missing-and-kept)
    keep_cond = in_dim & (
        (in_snap & ~changed) if close_missing else (~in_snap | ~changed)
    )
    kept = j.filter(keep_cond).select(*keys, *tracked, valid_from, valid_to)
    # arm 2: rows closed at `effective` (changed, or missing under
    # close_missing)
    close_cond = in_dim & (
        (in_snap & changed) | (F.lit(close_missing) & ~in_snap)
    )
    closed = j.filter(close_cond).select(
        *keys, *tracked, valid_from, ts.alias(valid_to)
    )
    # arm 3: fresh versions (new keys, or the new side of a change)
    opened = j.filter(in_snap & (~in_dim | changed)).select(
        *[F.col(f"_s_{k}").alias(k) for k in keys],
        *[F.col(f"_s_{c}").alias(c) for c in tracked],
        F.lit(effective).cast(dim.schema[valid_from].dataType).alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
    )
    return hist.select(*keys, *tracked, valid_from, valid_to).unionByName(
        kept
    ).unionByName(closed).unionByName(opened)


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
