"""Sketching / robust-stats / frontier operators, round 3e.

Three more operators, all expression-only with bit-exact DuckDB oracles:

- ``sketch_countmin_topk``: Count-Min sketch (Cormode & Muthukrishnan '05)
  heavy-hitter estimation over document tokens. The sketch state (4 x 256
  counters over the portable 60-bit hash) is bit-reproducible cross-engine,
  so the FULL pipeline — build, point query (min over rows), comparison to
  exact counts — is oracle-exact, and the CMS no-underestimate invariant is
  verified in-plan on every emitted row.
- ``anomaly_mad_flags``: robust per-group anomaly accounting via median /
  MAD (median absolute deviation). Medians are the exact DISCRETE lower
  median selected by rank (no interpolation arithmetic — engines differ in
  ulp-level interpolation order, a discrete element is bit-portable), and
  the flag threshold |v - med| > 3 * 1.4826 * MAD is elementwise IEEE, so
  the whole pipeline hash-matches.
- ``skyline_pareto``: the 2-D skyline (Pareto frontier) of orders —
  cheapest-earliest — via the running-min formulation: a point is on the
  frontier iff its y is strictly below the minimum y of every point sorted
  before it. Computed scale-safely with the two-pass range-partition shape
  (per-partition running min + driver-side prefix of 32 partition minima),
  not a single-partition global window.

Reference parity note: the reference (SURVEY.md §0) has no analytics
surface; these extend the batch side per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import events_tbl, tbl
from .retrieval3 import _TOKS_DUCK, _TOKS_SPARK

# ---------------------------------------------------------------------------
# sketch_countmin_topk
# ---------------------------------------------------------------------------

CMS_ROWS = 4
CMS_WIDTH = 256
CMS_TOPK = 20

# CMS counters over a token stream equal, for each (row, bucket), the sum of
# exact counts of all tokens hashing there — so the sketch can be built from
# the per-token count table (one groupBy) instead of fanning every
# occurrence out 4x. Bucket r of token t: portable_hash('r|t') mod width.


def _cms_oracle() -> str:
    buckets = ", ".join(
        f"{h60_duck(f'''({r} || '|' || t)''')} % {CMS_WIDTH} AS b{r}" for r in range(CMS_ROWS)
    )
    est = ", ".join(
        f"CAST((SELECT SUM(c) FROM tok_counts x WHERE "
        f"{h60_duck(f'''({r} || '|' || x.t)''')} % {CMS_WIDTH} = h.b{r}) AS BIGINT) AS e{r}"
        for r in range(CMS_ROWS)
    )
    least = "LEAST(" + ", ".join(f"e{r}" for r in range(CMS_ROWS)) + ")"
    return f"""
WITH toks AS (
  SELECT UNNEST({_TOKS_DUCK}) AS t FROM documents
),
tok_counts AS (
  SELECT t, COUNT(*) AS c FROM toks GROUP BY t
),
topk AS (
  SELECT t, c FROM tok_counts ORDER BY c DESC, t LIMIT {CMS_TOPK}
),
hashed AS (
  SELECT t, c, {buckets} FROM topk
),
est AS (
  SELECT t, c, {est} FROM hashed h
)
SELECT t AS token, c AS exact_c, {least} AS est_c,
       {least} >= c AS no_underestimate,
       {least} - c AS overshoot
FROM est
"""


@register(
    "sketch_countmin_topk",
    oracle=_cms_oracle(),
    description=f"Count-Min sketch ({CMS_ROWS}x{CMS_WIDTH}, portable hash) heavy-hitter "
    f"estimates vs exact counts for the top {CMS_TOPK} tokens — sketch state bit-exact",
    tags=("sketch", "countmin", "text", "extension"),
)
def sketch_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build: one token-count groupBy (map-side combined), then a 4x fan-out
    of the DISTINCT-token table into (row, bucket) partial sums — sketch
    size is CMS_ROWS x CMS_WIDTH regardless of corpus size, the property
    that makes CMS state mergeable across partitions/days at 100 TB. Query:
    the exact top-k (TakeOrderedAndProject) broadcast-joins the 1024-row
    sketch; est = min over rows. The no_underestimate column verifies the
    CMS lower-bound invariant on every emitted row in-plan.
    """
    toks = tbl(spark, sf_dir, "documents").select(F.explode(F.expr(_TOKS_SPARK)).alias("t"))
    tok_counts = toks.groupBy("t").agg(F.count("*").alias("c"))
    # 4-row fan-out of the distinct-token table -> CMS counters
    fan = tok_counts.select(
        "c",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (F.expr(h60_spark(f"concat('{r}', '|', t)")) % CMS_WIDTH).alias("b"),
                    )
                    for r in range(CMS_ROWS)
                ]
            )
        ).alias("rb"),
    )
    cms = fan.groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b")).agg(
        F.sum("c").alias("counter")
    )
    topk = tok_counts.orderBy(F.desc("c"), "t").limit(CMS_TOPK)
    hashed = topk.select(
        "t",
        "c",
        *[
            (F.expr(h60_spark(f"concat('{r}', '|', t)")) % CMS_WIDTH).alias(f"b{r}")
            for r in range(CMS_ROWS)
        ],
    )
    est = hashed
    for r in range(CMS_ROWS):
        cr = cms.filter(F.col("r") == r).select(
            F.col("b").alias(f"b{r}"), F.col("counter").alias(f"e{r}")
        )
        est = est.join(F.broadcast(cr), f"b{r}")
    least = F.least(*[F.col(f"e{r}") for r in range(CMS_ROWS)])
    return est.select(
        F.col("t").alias("token"),
        F.col("c").alias("exact_c"),
        least.alias("est_c"),
        (least >= F.col("c")).alias("no_underestimate"),
        (least - F.col("c")).alias("overshoot"),
    )


# ---------------------------------------------------------------------------
# anomaly_mad_flags
# ---------------------------------------------------------------------------

MAD_SIGMA = 3.0
MAD_CONSISTENCY = 1.4826  # normal-consistency constant

_MAD_ORACLE = f"""
WITH ev AS (
  SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM ev
),
med AS (
  SELECT event_type, value AS med FROM ranked WHERE rn = (n + 1) // 2
),
dev AS (
  SELECT e.event_type, e.event_id, e.value, m.med, abs(e.value - m.med) AS adev
  FROM ev e JOIN med m ON m.event_type = e.event_type
),
dranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY adev, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
mad AS (
  SELECT event_type, adev AS mad FROM dranked WHERE rn = (n + 1) // 2
)
SELECT d.event_type,
       COUNT(*) AS n,
       MIN(d.med) AS med,
       MIN(m.mad) AS mad,
       CAST(SUM(CASE WHEN d.adev > {MAD_SIGMA} * {MAD_CONSISTENCY} * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM dev d JOIN mad m ON m.event_type = d.event_type
GROUP BY d.event_type
"""


@register(
    "anomaly_mad_flags",
    oracle=_MAD_ORACLE,
    description="Robust per-type anomaly accounting: discrete lower median + MAD, "
    f"flag |v - med| > {MAD_SIGMA} * {MAD_CONSISTENCY} * MAD — bit-portable (no interpolation)",
    tags=("timeseries", "robust", "anomaly", "extension"),
)
def anomaly_mad_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two ranked-selection passes (each: one shuffle on event_type, a
    partitioned window, a rank filter) + broadcast of the per-type medians
    back — the exact-median-per-group shape that scales as long as single
    groups fit a partition (event types are few and fat; AQE skew-split
    covers a hot type). The DISCRETE lower median (element at rank
    ceil(n/2) over (value, event_id)) avoids interpolation arithmetic whose
    rounding order differs between engines; deviations and the flag
    comparison are elementwise IEEE, identical everywhere.
    """
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_type", "event_id", "value")
    )

    def discrete_median(df: DataFrame, col: str, out: str) -> DataFrame:
        w = W.partitionBy("event_type")
        ranked = df.withColumn("rn", F.row_number().over(w.orderBy(col, "event_id"))).withColumn(
            "n", F.count("*").over(w)
        )
        return ranked.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
            "event_type", F.col(col).alias(out)
        )

    med = discrete_median(ev, "value", "med")
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = discrete_median(dev.select("event_type", "event_id", F.col("adev").alias("value")), "value", "mad")
    flagged = dev.join(F.broadcast(mad), "event_type")
    return flagged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min("med").alias("med"),
        F.min("mad").alias("mad"),
        F.sum(
            F.when(
                F.col("adev") > F.lit(MAD_SIGMA) * F.lit(MAD_CONSISTENCY) * F.col("mad"), 1
            ).otherwise(0)
        ).alias("n_anomalies"),
    )


# ---------------------------------------------------------------------------
# skyline_pareto
# ---------------------------------------------------------------------------

_SKYLINE_ORACLE = """
WITH pts AS (
  SELECT o_totalprice AS price, o_orderdate AS odate,
         MIN(o_orderkey) AS keeper_orderkey, COUNT(*) AS n_dups
  FROM orders
  GROUP BY o_totalprice, o_orderdate
),
ordered AS (
  SELECT *, MIN(odate) OVER (
           ORDER BY price, odate
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS min_prec_date
  FROM pts
)
SELECT price, odate, keeper_orderkey, n_dups
FROM ordered
WHERE min_prec_date IS NULL OR odate < min_prec_date
"""


@register(
    "skyline_pareto",
    oracle=_SKYLINE_ORACLE,
    description="2-D skyline (Pareto frontier) of orders: cheapest-earliest — "
    "running-min formulation, scale-safe two-pass range partition (no global window)",
    tags=("relational", "skyline", "extension"),
)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """After exact-duplicate (price, date) collapse, a point is on the
    frontier iff its date precedes the min date of every point sorting
    before it on (price, date) — strict dominance falls out because exact
    ties were collapsed. Scale shape: repartitionByRange on the sort key,
    per-partition running min (parallel WindowExec), then the 32 partition
    minima — metadata, not data — prefix-fold driver-side and broadcast
    back, mirroring operators/ranking.py. The oracle states the identical
    running-min definition as one single-node window.
    """
    pts = (
        tbl(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_totalprice").alias("price"), F.col("o_orderdate").alias("odate")
        )
        .agg(F.min("o_orderkey").alias("keeper_orderkey"), F.count("*").alias("n_dups"))
    )
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = (
        pts.repartitionByRange(n_part, "price", "odate")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    # pass 1: per-partition minimum date (metadata-scale: one row/partition)
    mins = {
        r["_pid"]: r["mn"]
        for r in part.groupBy("_pid").agg(F.min("odate").alias("mn")).collect()
    }
    prefix = []  # (pid, min date over all STRICTLY EARLIER partitions)
    running = None
    for pid in sorted(mins):
        prefix.append((pid, running))
        running = mins[pid] if running is None else min(running, mins[pid])
    off = spark.createDataFrame(prefix, "_pid int, prec_part_min date")
    # pass 2: within-partition running min + the broadcast cross-partition floor
    wl = (
        W.partitionBy("_pid")
        .orderBy("price", "odate")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    out = (
        part.join(F.broadcast(off), "_pid")
        .withColumn("min_in_part", F.min("odate").over(wl))
        # least() skips NULLs (empty frame / first partition), NULL only if both are
        .withColumn("min_prec", F.least("min_in_part", "prec_part_min"))
    )
    # NOTE: `part` stays persisted until the query runs — the prefix map is
    # keyed by the sampled range layout; dropping the cache here could let
    # repartitionByRange re-sample different boundaries at execution time.
    return out.filter(F.col("min_prec").isNull() | (F.col("odate") < F.col("min_prec"))).select(
        "price", "odate", "keeper_orderkey", "n_dups"
    )


# ---------------------------------------------------------------------------
# percentile_bands_hourly
# ---------------------------------------------------------------------------

_PCTS = (50, 95, 99)

_PCT_BANDS_ORACLE = f"""
WITH ev AS (
  SELECT date_trunc('hour', ts) AS hour_bucket, event_id, value
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY hour_bucket ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY hour_bucket) AS n
  FROM ev
)
SELECT hour_bucket, MIN(n) AS n,
       {", ".join(
           f"MIN(CASE WHEN rn = ({p} * n + 99) // 100 THEN value END) AS p{p}"
           for p in _PCTS
       )},
       MAX(value) AS max_value
FROM ranked
GROUP BY hour_bucket
"""


@register(
    "percentile_bands_hourly",
    oracle=_PCT_BANDS_ORACLE,
    description="Per-hour discrete p50/p95/p99/max latency-style bands — rank-selected "
    "exact percentiles (no interpolation), one window pass per bucket",
    tags=("timeseries", "percentile", "dashboard", "extension"),
)
def percentile_bands_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ops-dashboard shape: per time bucket, exact discrete percentiles
    selected by rank (ceil(p*n/100) over a unique (value, event_id) order).
    ONE shuffle on the bucket key total: the two back-to-back Window nodes
    (ordered row_number frame + unbounded count frame) and the final hash
    agg all reuse the hour_bucket partitioning (plan-pinned).
    Buckets are naturally balanced time slices; a hot hour is split by AQE.
    Discrete selection keeps every value an actual data element — exact,
    portable, and (unlike interpolated percentiles) identical across
    engines and executor counts.
    """
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select(F.date_trunc("hour", "ts").alias("hour_bucket"), "event_id", "value")
    )
    w = W.partitionBy("hour_bucket")
    ranked = ev.withColumn("rn", F.row_number().over(w.orderBy("value", "event_id"))).withColumn(
        "n", F.count("*").over(w)
    )
    return ranked.groupBy("hour_bucket").agg(
        F.min("n").alias("n"),
        *[
            F.min(F.when(F.col("rn") == F.expr(f"({p} * n + 99) div 100"), F.col("value"))).alias(
                f"p{p}"
            )
            for p in _PCTS
        ],
        F.max("value").alias("max_value"),
    )


# ---------------------------------------------------------------------------
# fuzzy_join_lev — Ed-Join prefix-filtered edit-similarity self-join
# ---------------------------------------------------------------------------

LEV_MAX = 3
FUZZY_Q = 4  # q-gram width
# One edit destroys at most Q distinct q-grams, so two names within LEV_MAX
# edits can disagree on at most LEV_MAX*Q grams: if the first LEV_MAX*Q + 1
# grams (in a fixed global order) of both names are disjoint, lev > LEV_MAX.
# Sharing one signature gram is therefore a GUARANTEED-recall candidate
# filter (Xiao/Wang/Lin, Ed-Join, VLDB'08).
FUZZY_SIG = LEV_MAX * FUZZY_Q + 1  # 13 signature grams per name
FUZZY_MIN_LEN = FUZZY_Q + LEV_MAX * FUZZY_Q  # below this the bound is vacuous

_FUZZY_ORACLE = f"""
WITH names AS (
  SELECT p_partkey AS key, p_name AS name FROM part
  WHERE length(p_name) >= {FUZZY_MIN_LEN}
),
grams AS (
  SELECT DISTINCT key, g.gram
  FROM (SELECT key, UNNEST(list_transform(range(1, length(name) - {FUZZY_Q - 2}),
            i -> substr(name, i, {FUZZY_Q}))) AS gram FROM names) g(key, gram)
),
freq AS (
  SELECT gram, COUNT(*) AS df FROM grams GROUP BY gram
),
sig AS (
  SELECT key, gram FROM (
    SELECT g.key, g.gram,
           ROW_NUMBER() OVER (PARTITION BY g.key ORDER BY f.df, g.gram) AS rn
    FROM grams g JOIN freq f ON f.gram = g.gram
  ) WHERE rn <= {FUZZY_SIG}
),
cand AS (
  SELECT DISTINCT a.key AS key_a, b.key AS key_b
  FROM sig a JOIN sig b ON b.gram = a.gram AND a.key < b.key
),
verified AS (
  SELECT c.key_a, c.key_b, levenshtein(na.name, nb.name) AS lev
  FROM cand c
  JOIN names na ON na.key = c.key_a
  JOIN names nb ON nb.key = c.key_b
  WHERE abs(length(na.name) - length(nb.name)) <= {LEV_MAX}
)
SELECT key_a, key_b, CAST(lev AS INT) AS lev FROM verified WHERE lev <= {LEV_MAX}
"""


@register(
    "fuzzy_join_lev",
    oracle=_FUZZY_ORACLE,
    description=f"Edit-similarity self-join on part names (ALL pairs lev <= {LEV_MAX}) "
    f"via Ed-Join prefix filtering: {FUZZY_SIG} rarest q-grams as guaranteed-recall "
    "signatures, then exact levenshtein verification",
    tags=("relational", "fuzzy", "linkage", "extension"),
)
def fuzzy_join_lev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered edit-similarity join (Ed-Join, VLDB'08): each name's
    signature is its FUZZY_SIG globally-rarest distinct q-grams (order: df
    asc, gram asc); a pair within LEV_MAX edits must share a signature gram
    — recall is guaranteed by the pigeonhole bound, unlike ad-hoc prefix
    blocking (which on this data has only 8 distinct 4-char prefixes and
    degenerates to ~all-pairs). Shuffles: gram explode is map-side; the df
    count and the per-name top-FUZZY_SIG window are keyed aggregations; the
    candidate self-join shuffles on the gram — signature grams are the
    rarest by construction, so blocks stay small as the corpus grows (the
    rarer the gram, the stronger the filter). Length-band lower bound
    prunes before the levenshtein verify. Names shorter than FUZZY_MIN_LEN
    are excluded (the bound is vacuous there) in both engines.
    """
    names = (
        tbl(spark, sf_dir, "part")
        .filter(F.length("p_name") >= FUZZY_MIN_LEN)
        .select(F.col("p_partkey").alias("key"), F.col("p_name").alias("name"))
    )
    grams = names.select(
        "key",
        F.explode(
            F.expr(
                f"transform(sequence(1, length(name) - {FUZZY_Q - 1}), "
                f"i -> substring(name, i, {FUZZY_Q}))"
            )
        ).alias("gram"),
    ).distinct()
    freq = grams.groupBy("gram").agg(F.count("*").alias("df"))
    sig = (
        grams.join(freq, "gram")
        .withColumn("rn", F.row_number().over(W.partitionBy("key").orderBy("df", "gram")))
        .filter(F.col("rn") <= FUZZY_SIG)
        .select("key", "gram")
    )
    a = sig.select(F.col("key").alias("key_a"), "gram")
    b = sig.select(F.col("key").alias("key_b"), "gram")
    cand = (
        a.join(b, "gram").filter(F.col("key_a") < F.col("key_b")).select("key_a", "key_b").distinct()
    )
    na = names.select(F.col("key").alias("key_a"), F.col("name").alias("name_a"))
    nb = names.select(F.col("key").alias("key_b"), F.col("name").alias("name_b"))
    return (
        cand.join(na, "key_a")
        .join(nb, "key_b")
        .filter(F.abs(F.length("name_a") - F.length("name_b")) <= LEV_MAX)
        .filter(F.levenshtein("name_a", "name_b") <= LEV_MAX)
        .select("key_a", "key_b", F.levenshtein("name_a", "name_b").cast("int").alias("lev"))
    )
