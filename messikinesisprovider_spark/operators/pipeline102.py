"""Round 8 additions, part 12: data valuation.

``data_shapley_knn`` — exact KNN-Shapley data valuation (Jia et al.,
PVLDB 2019, arXiv:1908.08619): for a K-NN classifier the Shapley value
of every training point has a CLOSED FORM — sort by distance to a test
point, then the single-pass recurrence

    s(T) = 1[y_T = y] / T
    s(m) = s(m+1) + (1[y_m = y] - 1[y_m+1 = y]) * min(K, m) / (K * m)

so no coalition enumeration is needed. This op scores every training
embedding against a deterministic h60-sampled panel of test vectors,
truncated to each test point's T=64 nearest neighbors (points beyond the
neighborhood carry vanishing value — the standard truncation; the
recurrence is exact WITHIN the neighborhood). This is the
training-data-curation readout — "which examples help, which hurt" —
next to the quality filters: a NEGATIVE value marks a point whose label
disagrees with its neighborhood.

Per test point the plan is one broadcast distance scan, one window
top-T, and one bounded fold; deltas are small-integer rationals
evaluated identically per row, and every suffix sum folds the same
elements in the same rank order in both engines.

Reference parity note: the reference engine (SURVEY.md §0) has no
analytics surface; this extends the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from .dedup import bind1, h60_duck, h60_spark
from .relational import tbl

_DS_K = 5  # the K of the KNN classifier being valued
_DS_T = 64  # truncation: exact recurrence over the T-nearest neighborhood
_DS_NQ = 4  # deterministic test-panel size


def _ds_oracle() -> str:
    h = h60_duck("'dsq|' || CAST(vec_id AS VARCHAR)")
    return f"""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x,
         {h} AS hk
  FROM embeddings WHERE label IS NOT NULL
),
q AS (
  SELECT vec_id AS test_id, label AS test_label, x AS qx
  FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY hk, vec_id) AS rn FROM e)
  WHERE rn <= {_DS_NQ}
),
pairs AS (
  SELECT q.test_id, t.vec_id AS train_id,
         list_sum(list_transform(range(1, len(t.x) + 1),
                                 k -> (t.x[k] - q.qx[k]) * (t.x[k] - q.qx[k]))) AS dist,
         CASE WHEN t.label = q.test_label THEN 1 ELSE 0 END AS same
  FROM e t CROSS JOIN q
  WHERE t.vec_id <> q.test_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY test_id ORDER BY dist, train_id) AS rnk
  FROM pairs
),
packed AS (
  SELECT test_id,
         list(struct_pack(rnk := rnk, train_id := train_id, same := same,
                          dist := dist) ORDER BY rnk) AS arr
  FROM ranked WHERE rnk <= {_DS_T}
  GROUP BY 1
),
prepped AS (
  SELECT test_id, arr,
         list_transform(range(1, len(arr)),
           j -> (arr[j].same - arr[j + 1].same)
                * LEAST({_DS_K}, j) / ({_DS_K}.0 * j)) AS d,
         arr[len(arr)].same / CAST(len(arr) AS DOUBLE) AS s_last
  FROM packed
)
SELECT test_id, u.train_id AS train_id, u.rnk AS rnk, u.same = 1 AS same_label,
       CAST(ROUND(u.dist, 6) AS DOUBLE) AS dist_sq,
       CAST(ROUND(u.s, 6) AS DOUBLE) AS shapley_value
FROM prepped,
     UNNEST(list_transform(arr, (x, i) -> struct_pack(
       train_id := x.train_id, rnk := x.rnk, same := x.same, dist := x.dist,
       s := s_last + COALESCE(list_sum(list_transform(d[i:len(d)], v -> v)), 0.0)
     ))) AS t(u)
"""


@register(
    "data_shapley_knn",
    oracle=_ds_oracle(),
    description=f"Exact KNN-Shapley data valuation (Jia et al. PVLDB 2019, "
    f"arXiv:1908.08619): closed-form Shapley value of each training "
    f"embedding for a K={_DS_K} NN classifier against an h60-sampled "
    f"{_DS_NQ}-vector test panel, exact over each point's T={_DS_T} "
    "neighborhood — negative values mark label-neighborhood disagreement, "
    "the which-examples-hurt curation readout; broadcast scan + top-T "
    "window + bounded rank-ordered suffix folds",
    tags=("valuation", "embedding", "curation", "extension"),
)
def data_shapley_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-scale work is one broadcast-test distance scan and a
    top-T window per test point; the Shapley recurrence itself runs on
    T-element arrays. At 100 TB the same plan holds with an LSH prefilter
    feeding the window (the sim_ann_lsh composition) — the recurrence
    stage is unchanged."""
    e = (
        tbl(spark, sf_dir, "embeddings")
        .filter(F.col("label").isNotNull())
        .select(
            "vec_id",
            "label",
            F.expr("transform(embedding, v -> CAST(v AS DOUBLE))").alias("x"),
            F.expr(h60_spark("'dsq|' || CAST(vec_id AS STRING)")).alias("hk"),
        )
    )
    q = (
        e.orderBy("hk", "vec_id")
        .limit(_DS_NQ)
        .select(
            F.col("vec_id").alias("test_id"),
            F.col("label").alias("test_label"),
            F.col("x").alias("qx"),
        )
    )
    pairs = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("test_id"))
        .select(
            "test_id",
            F.col("vec_id").alias("train_id"),
            F.expr(
                "aggregate(zip_with(x, qx, (p, v) -> (p - v) * (p - v)), "
                "0D, (acc, v) -> acc + v)"
            ).alias("dist"),
            F.when(F.col("label") == F.col("test_label"), 1)
            .otherwise(0)
            .alias("same"),
        )
    )
    w = Window.partitionBy("test_id").orderBy("dist", "train_id")
    packed = (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _DS_T)
        .groupBy("test_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rnk", "train_id", "same", "dist"))
            ).alias("arr")
        )
    )
    prepped = packed.select(
        "test_id",
        "arr",
        F.expr(
            f"transform(sequence(1, size(arr) - 1), "
            f"j -> (arr[j - 1].same - arr[j].same) "
            f"* least({_DS_K}, j) / ({_DS_K}.0 * j))"
        ).alias("d"),
        F.expr("element_at(arr, -1).same / CAST(size(arr) AS DOUBLE)").alias(
            "s_last"
        ),
    ).filter(F.size("arr") >= 2)
    return prepped.select(
        "test_id",
        F.expr(
            "inline(transform(arr, (x, i) -> struct("
            "  x.train_id AS train_id, CAST(x.rnk AS BIGINT) AS rnk,"
            "  x.same = 1 AS same_label,"
            "  CAST(ROUND(x.dist, 6) AS DOUBLE) AS dist_sq,"
            "  CAST(ROUND(s_last + coalesce(aggregate("
            "    slice(d, i + 1, size(d) - i), 0D, (a, v) -> a + v), 0D), 6)"
            "  AS DOUBLE) AS shapley_value)))"
        ),
    )
