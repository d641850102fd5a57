"""Temporal operator family over a history view (a DataFrame with a
`revision` column and `record_key` identity, as produced by
VersionedStore.history_view).

Reference parity (SURVEY.md §2.7 — bundles/sirix-core/.../axis/temporal/):
- AllTimeAxis.java:20   → all_times
- PastAxis / FutureAxis → past / future
- PreviousAxis / NextAxis (Previous.java/Next.java) → previous / next
- First.java / Last.java → first / last
- ItemHistory.java:40   → item_history (revisions where changed)
- IsDeleted.java        → is_deleted

All are single-shuffle window/aggregate ops keyed by record_key —
no driver loops, no UDFs; scale with the history view's partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sirix_spark.store.store import RECORD_KEY


def _w():
    return Window.partitionBy(RECORD_KEY).orderBy("revision")


def all_times(history: DataFrame, record_key=None) -> DataFrame:
    """Every version of the record(s) across revisions."""
    return history if record_key is None else history.filter(F.col(RECORD_KEY) == record_key)


def past(history: DataFrame, revision: int, include_self: bool = False) -> DataFrame:
    cmp = F.col("revision") <= revision if include_self else F.col("revision") < revision
    return history.filter(cmp)


def future(history: DataFrame, revision: int, include_self: bool = False) -> DataFrame:
    cmp = F.col("revision") >= revision if include_self else F.col("revision") > revision
    return history.filter(cmp)


def with_previous(history: DataFrame, cols: list[str]) -> DataFrame:
    """Adjacent earlier version per record (jn:previous): lag over
    the revision axis."""
    out = history
    for c in cols:
        out = out.withColumn(f"prev_{c}", F.lag(c).over(_w()))
    return out


def with_next(history: DataFrame, cols: list[str]) -> DataFrame:
    """Adjacent later version per record (jn:next)."""
    out = history
    for c in cols:
        out = out.withColumn(f"next_{c}", F.lead(c).over(_w()))
    return out


def first(history: DataFrame) -> DataFrame:
    """Earliest version of each record (jn:first)."""
    w = Window.partitionBy(RECORD_KEY).orderBy(F.col("revision").asc())
    return history.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def last(history: DataFrame) -> DataFrame:
    """Latest version of each record (jn:last)."""
    w = Window.partitionBy(RECORD_KEY).orderBy(F.col("revision").desc())
    return history.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def item_history(history: DataFrame) -> DataFrame:
    """Only the revisions where the record's payload actually changed
    (sdb:item-history): compare a stable hash of the payload against
    the previous revision's."""
    payload = [c for c in history.columns if c not in (RECORD_KEY, "revision")]
    h = F.sha2(F.to_json(F.struct(*[F.col(c) for c in payload])), 256)
    hist = history.withColumn("_h", h).withColumn("_ph", F.lag("_h").over(_w()))
    return (
        hist.filter(F.col("_ph").isNull() | (F.col("_h") != F.col("_ph")))
        .drop("_h", "_ph")
    )


def is_deleted(history: DataFrame, record_key, revision: int) -> bool:
    """Tombstone check (sdb:is-deleted): existed earlier, absent at
    `revision`. One aggregate over the key's history — a single
    driver action, not two counts."""
    row = (
        history.filter(F.col(RECORD_KEY) == record_key)
        .agg(
            F.max(F.col("revision") < revision).alias("existed"),
            F.max(F.col("revision") == revision).alias("present"),
        )
        .first()
    )
    return bool(row["existed"]) and not bool(row["present"])
