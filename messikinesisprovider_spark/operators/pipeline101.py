"""Round 8 additions, part 11: linkage-parameter EM and local differential
privacy.

``er_em_mu_estimation`` — one EM iteration of the Fellegi-Sunter mixture
(Winkler 1988, "Using the EM algorithm for weight computation in the
Fellegi-Sunter model"): where ``er_fellegi_sunter`` SCORES pairs with
fixed parameters, this op ESTIMATES them — per-pattern match
responsibilities (E-step) from literal priors over the 2^3 agreement
patterns of nation-blocked customer pairs, then the M-step updates of
lambda and every field's m/u probability. Pattern counts are exact
integers; every cross-pattern reduction is a pattern-ordered sequential
fold (8 elements), so the doubles are bit-identical cross-engine.

``ldp_randomized_response`` — Warner's randomized response (JASA 1965),
the LOCAL differential-privacy mechanism (eps = ln 3 at p = 3/4) next to
``dp_noisy_count_release``'s central Laplace: each event reports its true
purchase bit with probability 3/4 (flip decision = seeded h60 uniform,
the deterministic twin of the client's coin), and the per-day collector
de-biases pi_hat = (mean_reported - (1-p)) / (2p - 1). True rates ride
along as the utility audit — the production path publishes only the
de-biased estimate.

Reference parity note: the reference engine (SURVEY.md §0) has no
analytics surface; these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import h60_duck, h60_spark
from .pipeline95 import _FS_M
from .relational import events_tbl, tbl

# ---------------------------------------------------------------------------
# er_em_mu_estimation
# ---------------------------------------------------------------------------

_EM_FIELDS = ("seg", "bal", "cents")
_EM_LAMBDA0 = 0.1
_EM_U0 = {"seg": 0.3, "bal": 0.2, "cents": 0.1}

_EM_FIELDS_SQL = """
  SELECT c_custkey AS id, c_nationkey AS blk,
         c_mktsegment AS f_seg,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS f_bal,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) % 100 AS f_cents
  FROM customer
"""


def _em_r_sql() -> str:
    """Per-pattern responsibility r = lambda*prod(m-terms) / (that +
    (1-lambda)*prod(u-terms)), with agreement bit i read from the pattern
    integer — identical expression text in both engines."""
    # head factors CAST AS DOUBLE: Spark parses bare decimal literals as
    # DECIMAL and a decimal product chain rounds before the division (the
    # ab_sprt_sequential class); complements are formatted :g so python
    # float noise (1.0 - 0.95 = 0.050000...044) never reaches the SQL text
    pm = f"CAST({_EM_LAMBDA0:g} AS DOUBLE)"
    pu = f"CAST({1.0 - _EM_LAMBDA0:g} AS DOUBLE)"
    for i, f in enumerate(_EM_FIELDS):
        bit = f"(CAST(floor(pattern / {2 ** (len(_EM_FIELDS) - 1 - i)}.0) AS BIGINT) % 2)"
        m, u = _FS_M[f], _EM_U0[f]
        pm += f" * (CASE WHEN {bit} = 1 THEN {m:g} ELSE {round(1.0 - m, 6):g} END)"
        pu += f" * (CASE WHEN {bit} = 1 THEN {u:g} ELSE {round(1.0 - u, 6):g} END)"
    return f"(({pm}) / (({pm}) + ({pu})))"


def _em_oracle() -> str:
    def fold(term: str) -> str:
        return f"list_sum(list_transform(list({term} ORDER BY pattern), v -> v))"

    sums = {
        "sn": fold("CAST(n AS DOUBLE)"),
        "srn": fold("r * n"),
    }
    for i, f in enumerate(_EM_FIELDS):
        bit = f"(CAST(floor(pattern / {2 ** (len(_EM_FIELDS) - 1 - i)}.0) AS BIGINT) % 2)"
        sums[f"sma_{f}"] = fold(f"r * n * {bit}")
        sums[f"sua_{f}"] = fold(f"(1.0 - r) * n * {bit}")
    sum_cols = ",\n         ".join(f"{sql} AS {al}" for al, sql in sums.items())
    field_rows = ", ".join(
        f"('{f}', {_FS_M[f]}, {_EM_U0[f]}, {i})" for i, f in enumerate(_EM_FIELDS)
    )
    return f"""
WITH r AS MATERIALIZED ({_EM_FIELDS_SQL}),
p AS (
  SELECT 4 * (CASE WHEN a.f_seg = b.f_seg THEN 1 ELSE 0 END)
       + 2 * (CASE WHEN a.f_bal = b.f_bal THEN 1 ELSE 0 END)
       + (CASE WHEN a.f_cents = b.f_cents THEN 1 ELSE 0 END) AS pattern
  FROM r a JOIN r b ON a.blk = b.blk AND a.id < b.id
),
pat AS (
  SELECT pattern, CAST(COUNT(*) AS BIGINT) AS n, {_em_r_sql()} AS r
  FROM p GROUP BY 1
),
s AS (
  SELECT {sum_cols}
  FROM pat
),
fields AS (SELECT * FROM (VALUES {field_rows}) t(field, m_prior, u_prior, i))
SELECT f.field,
       CAST(f.m_prior AS DOUBLE) AS m_prior,
       CAST(f.u_prior AS DOUBLE) AS u_prior,
       CAST(ROUND(CASE f.field
         {" ".join(f"WHEN '{f}' THEN s.sma_{f} / s.srn" for f in _EM_FIELDS)}
       END, 6) AS DOUBLE) AS m_updated,
       CAST(ROUND(CASE f.field
         {" ".join(f"WHEN '{f}' THEN s.sua_{f} / (s.sn - s.srn)" for f in _EM_FIELDS)}
       END, 6) AS DOUBLE) AS u_updated,
       CAST(ROUND(s.srn / s.sn, 6) AS DOUBLE) AS lambda_updated,
       CAST(s.sn AS BIGINT) AS n_pairs
FROM fields f CROSS JOIN s
"""


@register(
    "er_em_mu_estimation",
    oracle=_em_oracle(),
    description="One EM iteration of the Fellegi-Sunter mixture (Winkler "
    "1988): per-pattern match responsibilities over the 2^3 agreement "
    "patterns of nation-blocked customer pairs from literal priors, then "
    "M-step updates of lambda and each field's m/u probability — the "
    "parameter-ESTIMATION sibling of er_fellegi_sunter's fixed-parameter "
    "scoring; all cross-pattern sums are 8-element pattern-ordered folds",
    tags=("linkage", "probabilistic", "em", "extension"),
)
def er_em_mu_estimation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus collapses to <= 8 pattern-count rows before any float
    appears; blocked pair enumeration is bounded by block sizes exactly as
    in er_fellegi_sunter. The E/M algebra runs on those 8 rows."""
    c = tbl(spark, sf_dir, "customer")
    r = c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("blk"),
        F.col("c_mktsegment").alias("f_seg"),
        F.expr("CAST(FLOOR(c_acctbal / 1000) AS BIGINT)").alias("f_bal"),
        F.expr("CAST(ROUND(c_acctbal * 100) AS BIGINT) % 100").alias("f_cents"),
    )
    a, b = r.alias("a"), r.alias("b")
    ag = lambda f: F.when(F.col(f"a.f_{f}") == F.col(f"b.f_{f}"), 1).otherwise(0)  # noqa: E731
    p = a.join(
        b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id"))
    ).select(
        (ag("seg") * 4 + ag("bal") * 2 + ag("cents")).alias("pattern")
    )
    pat = (
        p.groupBy("pattern")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("r", F.expr(_em_r_sql()))
    )

    def fold(term: str, alias: str):
        return F.expr(
            "aggregate(transform(array_sort(collect_list(struct(pattern, "
            f"CAST(({term}) AS DOUBLE) AS t))), s -> s.t), 0D, (acc, x) -> acc + x)"
        ).alias(alias)

    aggs = [fold("n", "sn"), fold("r * n", "srn")]
    for i, f in enumerate(_EM_FIELDS):
        bit = f"(CAST(floor(pattern / {2 ** (len(_EM_FIELDS) - 1 - i)}.0) AS BIGINT) % 2)"
        aggs.append(fold(f"r * n * {bit}", f"sma_{f}"))
        aggs.append(fold(f"(1.0 - r) * n * {bit}", f"sua_{f}"))
    s = pat.agg(*aggs)
    field_structs = ", ".join(
        f"struct('{f}' AS field, CAST({_FS_M[f]} AS DOUBLE) AS m_prior, "
        f"CAST({_EM_U0[f]} AS DOUBLE) AS u_prior, "
        f"CAST(ROUND(sma_{f} / srn, 6) AS DOUBLE) AS m_updated, "
        f"CAST(ROUND(sua_{f} / (sn - srn), 6) AS DOUBLE) AS u_updated)"
        for f in _EM_FIELDS
    )
    return s.select(
        F.expr(f"inline(array({field_structs}))"),
        F.expr("CAST(ROUND(srn / sn, 6) AS DOUBLE)").alias("lambda_updated"),
        F.expr("CAST(sn AS BIGINT)").alias("n_pairs"),
    )


# ---------------------------------------------------------------------------
# ldp_randomized_response
# ---------------------------------------------------------------------------

_RR_P_NUM, _RR_P_DEN = 3, 4  # report truth with p = 3/4 -> eps = ln 3
_RR_THRESH = (1 << 60) * _RR_P_NUM // _RR_P_DEN  # h60 < this -> truthful


def _rr_oracle() -> str:
    h = h60_duck("'rr|' || CAST(event_id AS VARCHAR)")
    return f"""
WITH reported AS (
  SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b,
         CASE WHEN ({h}) < {_RR_THRESH}
              THEN (CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              ELSE 1 - (CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         END AS y
  FROM events WHERE ts IS NOT NULL
),
g AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS n_reported_yes,
         CAST(SUM(b) AS BIGINT) AS n_true_yes
  FROM reported GROUP BY 1
)
SELECT day, n, n_reported_yes,
       CAST(ROUND((n_reported_yes / CAST(n AS DOUBLE) - 0.25) / 0.5, 6)
            AS DOUBLE) AS pi_hat,
       CAST(ROUND(n_true_yes / CAST(n AS DOUBLE), 6) AS DOUBLE) AS pi_true,
       CAST(ROUND(ABS((n_reported_yes / CAST(n AS DOUBLE) - 0.25) / 0.5
                      - n_true_yes / CAST(n AS DOUBLE)), 6) AS DOUBLE) AS abs_err
FROM g
"""


@register(
    "ldp_randomized_response",
    oracle=_rr_oracle(),
    description="Warner randomized response (JASA 1965), the LOCAL-DP "
    "mechanism at p=3/4 (eps = ln 3): each event reports its purchase bit "
    "truthfully or flipped by a seeded h60 coin, per-day de-biased "
    "estimate pi_hat = (mean_reported - 1/4) / (1/2) with the true rate "
    "riding along as the utility audit — the client-side sibling of "
    "dp_noisy_count_release's central Laplace",
    tags=("privacy", "differential-privacy", "extension"),
)
def ldp_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure per-row arithmetic plus one day-keyed integer aggregation —
    the flip never leaves the row it belongs to, exactly like the client
    device it models. Integer-threshold coin: h60 < 3/4 * 2^60 exactly."""
    h = h60_spark("'rr|' || CAST(event_id AS STRING)")
    e = events_tbl(spark, sf_dir).filter(F.col("ts").isNotNull())
    b = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    reported = e.select(
        F.col("ts").cast("date").cast("timestamp").alias("day"),
        b.alias("b"),
        F.when(F.expr(h) < F.lit(_RR_THRESH), b).otherwise(1 - b).alias("y"),
    )
    g = reported.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_reported_yes"),
        F.sum("b").cast("long").alias("n_true_yes"),
    )
    mean_y = F.col("n_reported_yes") / F.col("n").cast("double")
    pi_true = F.col("n_true_yes") / F.col("n").cast("double")
    pi_hat = (mean_y - F.lit(0.25)) / F.lit(0.5)
    return g.select(
        "day",
        "n",
        "n_reported_yes",
        F.round(pi_hat, 6).cast("double").alias("pi_hat"),
        F.round(pi_true, 6).cast("double").alias("pi_true"),
        F.round(F.abs(pi_hat - pi_true), 6).cast("double").alias("abs_err"),
    )
