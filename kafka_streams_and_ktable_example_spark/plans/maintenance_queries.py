"""Operational-maintenance queries: compliance deletes and backfill planning.

Two jobs every production lakehouse runs on a schedule, expressed as
deterministic oracle-checked queries:

- ``maintenance_cascade_delete_audit`` — GDPR right-to-be-forgotten
  impact audit: a deterministic hash lottery picks the forget set, and
  the cascade (customer → orders → lineitem, plus the events keyed by
  the same user space) is counted per table BEFORE any data is touched.
- ``maintenance_backfill_plan`` — late-arrival detection against the
  ingestion high-water mark: which event-time days received data after
  the pipeline had already moved past them, i.e. which daily partitions
  a scheduled backfill must recompute.

The high-water mark uses operators/ranking.py::with_exact_prior_max —
the two-phase exact prefix-max — so the plan carries no unpartitioned
window even though "running max over the whole ingestion order" sounds
inherently sequential.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import register

# deterministic 5% forget lottery (same md5-bucket idiom as sampling_queries)
_FORGET_SPARK = (
    "cast(conv(substring(md5(cast({k} as string)), 1, 4), 16, 10) as int) % 100 < 5"
)
_FORGET_DUCK = (
    "CAST(('0x' || substr(md5(CAST({k} AS VARCHAR)), 1, 4)) AS INT) % 100 < 5"
)


_CASCADE_ORACLE = f"""
WITH forget AS MATERIALIZED (
  SELECT c_custkey FROM customer WHERE {_FORGET_DUCK.format(k='c_custkey')}
), fo AS MATERIALIZED (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM forget)
)
SELECT 'customer' AS table_name,
       (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_total,
       (SELECT CAST(count(*) AS BIGINT) FROM forget) AS n_forgotten
UNION ALL
SELECT 'orders',
       (SELECT CAST(count(*) AS BIGINT) FROM orders),
       (SELECT CAST(count(*) AS BIGINT) FROM fo)
UNION ALL
SELECT 'lineitem',
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem
         WHERE l_orderkey IN (SELECT o_orderkey FROM fo))
UNION ALL
SELECT 'events',
       (SELECT CAST(count(*) AS BIGINT) FROM events),
       (SELECT CAST(count(*) AS BIGINT) FROM events
         WHERE user_id IN (SELECT c_custkey FROM forget))
"""


@register(
    "maintenance_cascade_delete_audit",
    oracle=_CASCADE_ORACLE,
    doc="GDPR right-to-be-forgotten impact audit: a deterministic 5% "
    "md5-lottery over customers is the forget set; the audit counts the "
    "full cascade — their orders, those orders' lineitems, and the "
    "events keyed by the same user space — per table, before any delete "
    "runs (the dry-run every compliance pipeline wants). Plan shape: "
    "each fact table is counted once and semi-joined once; the forget "
    "set SCALES WITH SF, so no forced broadcast — the semi joins are "
    "left to AQE (shuffle-hash at 100 TB, where this is the standard "
    "anti-join delete pattern: the same semi join, negated, produces "
    "the retained table).",
    tags=("maintenance", "compliance", "join"),
)
def maintenance_cascade_delete_audit(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    forget = cust.where(F.expr(_FORGET_SPARK.format(k="c_custkey"))).select(
        "c_custkey"
    )
    fo = orders.join(
        forget, orders.o_custkey == forget.c_custkey, "left_semi"
    ).select("o_orderkey")

    def row(name, total_df, forgotten_df):
        t = total_df.agg(F.count("*").cast("long").alias("n_total"))
        g = forgotten_df.agg(F.count("*").cast("long").alias("n_forgotten"))
        return (
            t.crossJoin(F.broadcast(g))
            .select(
                F.lit(name).alias("table_name"), "n_total", "n_forgotten"
            )
        )

    return (
        row("customer", cust, forget)
        .unionByName(row("orders", orders, fo))
        .unionByName(
            row(
                "lineitem",
                li,
                li.join(fo, li.l_orderkey == fo.o_orderkey, "left_semi"),
            )
        )
        .unionByName(
            row(
                "events",
                ev,
                ev.join(forget, ev.user_id == forget.c_custkey, "left_semi"),
            )
        )
    )


_BACKFILL_ORACLE = """
WITH e AS (
  SELECT event_id,
         event_id + CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4))
                         AS INT) % 8 AS arr,
         CAST(ts AS DATE) AS d
  FROM events
), m AS (
  SELECT d,
         max(d) OVER (ORDER BY arr, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM e
)
SELECT d AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (WHERE d < pm) AS BIGINT) AS n_late,
       count(*) FILTER (WHERE d < pm) > 0 AS needs_backfill
FROM m GROUP BY d
"""


@register(
    "maintenance_backfill_plan",
    oracle=_BACKFILL_ORACLE,
    doc="Backfill planner: an event is LATE if its event-time day is below "
    "the ingestion high-water mark at its arrival (arrival order = "
    "event_id plus a deterministic md5 jitter <8 modeling out-of-order "
    "delivery); days with any late arrival need their partition "
    "recomputed. The high-water mark is an exact global prefix-max over "
    "arrival order — computed two-phase (ranking.py "
    "with_exact_prior_max): per-bucket PARTITIONED prior-max windows + "
    "a broadcast of per-bucket maxima, so the 'inherently sequential' "
    "running max never single-partitions the table. 100 TB: bucket "
    "count is a knob; each task sorts only its arrival-range slice.",
    tags=("maintenance", "streaming-adjacent", "window"),
)
def maintenance_backfill_plan(spark, sf_dir):
    from ..operators.ranking import with_exact_prior_max

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        (
            F.col("event_id")
            + F.expr(
                "cast(conv(substring(md5(cast(event_id as string)), 1, 4),"
                " 16, 10) as int) % 8"
            )
        ).alias("arr"),
        F.col("ts").cast("date").alias("d"),
    )
    m = with_exact_prior_max(
        ev, [("arr", True), ("event_id", True)], "d", name="pm"
    )
    late = F.coalesce(F.col("d") < F.col("pm"), F.lit(False))
    return m.groupBy(F.col("d").alias("day")).agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(late.cast("long")).cast("long").alias("n_late"),
        (F.sum(late.cast("long")) > 0).alias("needs_backfill"),
    )
