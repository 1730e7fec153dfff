"""Round 4 additions, part 40: community quality and burstiness.

- ``graph_modularity_lpa`` — closes the community-detection loop: run the
  same 3 synchronous LPA rounds as ``graph_label_propagation`` (same
  shared co-purchase edge table, same tiebreaks), then score the
  partition with Newman modularity — EXACTLY.  With m undirected edges,
  Q * 4m^2 = sum_c (4*m*e_c - d_c^2) is pure BIGINT arithmetic (e_c =
  intra-community edges, d_c = community degree sum), so the score that
  is usually quoted to three decimals is verified to the last bit; the
  one display division renders Q.  Per-community rows + the ALL row.

- ``fano_burstiness_by_type`` — the burstiness statistic (Fano factor =
  variance/mean of per-minute event counts) that separates Poisson-like
  traffic from bursty/bot traffic, per event type: variance numerator
  k*sum(c^2) - (sum c)^2 over the k ACTIVE minutes in the observed span
  is exact BIGINT; Fano = num / (k * sum) via one fixed-order double
  division pair.  Zero-count minutes inside the span are counted via the
  span length (max-min+1 minutes), not materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .pipeline7 import LPA_ROUNDS, _lpa_round_oracle
from .graph2 import _copurchase_edges
from .relational import events_tbl

# ---------------------------------------------------------------------------
# graph_modularity_lpa
# ---------------------------------------------------------------------------

_MOD_ORACLE = f"""
WITH e1 AS (SELECT pa, pb FROM (
       SELECT l_orderkey, l_partkey FROM lineitem GROUP BY ALL
     ) a(l_orderkey, pa)
     JOIN (SELECT l_orderkey, l_partkey FROM lineitem GROUP BY ALL
     ) b(l_orderkey, pb) USING (l_orderkey)
     WHERE pa < pb
     GROUP BY pa, pb HAVING COUNT(*) >= 2),
edges AS (SELECT pa AS src, pb AS dst FROM e1
          UNION ALL SELECT pb, pa FROM e1),
l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
{",".join(_lpa_round_oracle(f"l{i}", f"l{i + 1}") for i in range(LPA_ROUNDS))},
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e1),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src),
communities AS (
  SELECT l.lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_members,
         CAST(SUM(d.d) AS BIGINT) AS degree_sum
  FROM l{LPA_ROUNDS} l JOIN deg d ON d.node = l.node
  GROUP BY l.lbl
),
intra AS (
  SELECT la.lbl AS community, CAST(COUNT(*) AS BIGINT) AS e_intra
  FROM e1
  JOIN l{LPA_ROUNDS} la ON la.node = e1.pa
  JOIN l{LPA_ROUNDS} lb ON lb.node = e1.pb AND lb.lbl = la.lbl
  GROUP BY la.lbl
),
scored AS (
  SELECT c.community, c.n_members, c.degree_sum,
         COALESCE(i.e_intra, 0) AS e_intra,
         4 * m.m * COALESCE(i.e_intra, 0) - c.degree_sum * c.degree_sum AS q_term
  FROM communities c LEFT JOIN intra i ON i.community = c.community
  CROSS JOIN m
)
SELECT CAST(community AS VARCHAR) AS community, n_members, degree_sum, e_intra,
       CAST(q_term AS BIGINT) AS q_term
FROM scored
UNION ALL
SELECT 'ALL' AS community,
       CAST(SUM(n_members) AS BIGINT) AS n_members,
       CAST(SUM(degree_sum) AS BIGINT) AS degree_sum,
       CAST(SUM(e_intra) AS BIGINT) AS e_intra,
       CAST(SUM(q_term) AS BIGINT) AS q_term
FROM scored
"""


@register(
    "graph_modularity_lpa",
    oracle=_MOD_ORACLE,
    description=f"Newman modularity of the {LPA_ROUNDS}-round LPA "
    "partition, exact: Q*4m^2 = sum_c(4*m*e_c - d_c^2) in pure BIGINTs "
    "over the shared co-purchase edge table (intra-edges by a label-equal "
    "join, degrees one groupBy); per-community terms + the ALL row whose "
    "q_term/(4m^2) IS Q — the partition-quality score verified to the "
    "last bit",
    tags=("graph", "evaluation", "extension"),
)
def graph_modularity_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = _copurchase_edges(spark, sf_dir)  # a < b undirected, support-2
    edges = (
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .persist()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(LPA_ROUNDS):
        cnt = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy(F.col("src").alias("n"), "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        wk = W.partitionBy("n").orderBy(F.col("cnt").desc(), F.col("lbl"))
        labels = (
            cnt.withColumn("rk", F.row_number().over(wk))
            .filter(F.col("rk") == 1)
            .select(F.col("n").alias("node"), "lbl")
        )
    labels = labels.persist()
    m = und.agg(F.count(F.lit(1)).cast("long").alias("m"))
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    communities = (
        labels.join(deg, "node")
        .groupBy(F.col("lbl").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum("d").cast("long").alias("degree_sum"),
        )
    )
    la = labels.alias("la")
    lb = labels.alias("lb")
    intra = (
        und.join(la, F.col("la.node") == und.a)
        .join(lb, (F.col("lb.node") == und.b) & (F.col("lb.lbl") == F.col("la.lbl")))
        .groupBy(F.col("la.lbl").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_intra"))
    )
    scored = (
        communities.join(intra, "community", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            "n_members",
            "degree_sum",
            F.coalesce(F.col("e_intra"), F.lit(0)).alias("e_intra"),
            (
                4 * F.col("m") * F.coalesce(F.col("e_intra"), F.lit(0))
                - F.col("degree_sum") * F.col("degree_sum")
            )
            .cast("long")
            .alias("q_term"),
        )
    )
    per = scored.select(
        F.col("community").cast("string").alias("community"),
        "n_members",
        "degree_sum",
        "e_intra",
        "q_term",
    )
    allrow = scored.agg(
        F.sum("n_members").cast("long").alias("n_members"),
        F.sum("degree_sum").cast("long").alias("degree_sum"),
        F.sum("e_intra").cast("long").alias("e_intra"),
        F.sum("q_term").cast("long").alias("q_term"),
    ).select(F.lit("ALL").alias("community"), "n_members", "degree_sum", "e_intra", "q_term")
    return per.unionByName(allrow)


# ---------------------------------------------------------------------------
# fano_burstiness_by_type
# ---------------------------------------------------------------------------

_FANO_ORACLE = """
WITH pm AS (
  SELECT event_type, date_trunc('minute', ts) AS m, CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE ts IS NOT NULL
  GROUP BY event_type, date_trunc('minute', ts)
),
per AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS active_minutes,
         CAST(date_diff('minute', MIN(m), MAX(m)) + 1 AS BIGINT) AS span_minutes,
         CAST(SUM(c) AS BIGINT) AS n_events,
         CAST(SUM(c * c) AS BIGINT) AS sum_sq
  FROM pm GROUP BY event_type
)
SELECT event_type, active_minutes, span_minutes, n_events,
       CAST(span_minutes * sum_sq - n_events * n_events AS BIGINT) AS var_num_spanx,
       CASE WHEN n_events = 0 THEN 0.0
            ELSE CAST(span_minutes * sum_sq - n_events * n_events AS DOUBLE)
                 / CAST(span_minutes AS DOUBLE) / CAST(n_events AS DOUBLE)
       END AS fano
FROM per
"""


@register(
    "fano_burstiness_by_type",
    oracle=_FANO_ORACLE,
    description="Fano factor (variance/mean of per-minute counts) per "
    "event type over the observed span — the Poisson-vs-bursty traffic "
    "statistic: variance numerator span*sum(c^2) - (sum c)^2 is exact "
    "BIGINT with zero-count minutes entering via the span length (never "
    "materialized); two fixed-order IEEE divisions render the factor",
    tags=("analytics", "timeseries", "statistics", "extension"),
)
def fano_burstiness_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    pm = (
        events_tbl(spark, sf_dir)
        .filter(F.col("ts").isNotNull())
        .groupBy("event_type", F.date_trunc("minute", "ts").alias("m"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    per = pm.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("active_minutes"),
        (
            (F.unix_timestamp(F.max("m")) - F.unix_timestamp(F.min("m"))) / 60 + 1
        )
        .cast("long")
        .alias("span_minutes"),
        F.sum("c").cast("long").alias("n_events"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_sq"),
    )
    return per.select(
        "event_type",
        "active_minutes",
        "span_minutes",
        "n_events",
        (F.col("span_minutes") * F.col("sum_sq") - F.col("n_events") * F.col("n_events"))
        .cast("long")
        .alias("var_num_spanx"),
        F.when(F.col("n_events") == 0, F.lit(0.0))
        .otherwise(
            (
                F.col("span_minutes") * F.col("sum_sq")
                - F.col("n_events") * F.col("n_events")
            ).cast("double")
            / F.col("span_minutes").cast("double")
            / F.col("n_events").cast("double")
        )
        .alias("fano"),
    )
