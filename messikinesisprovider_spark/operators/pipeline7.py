"""Hybrid retrieval and community detection, round 3g.

- ``retrieval_rrf_hybrid``: reciprocal-rank fusion (Cormack et al., SIGIR'09)
  of the lexical BM25 leg and the semantic cosine leg — the standard hybrid
  search shape (sparse + dense retrieval fused by rank, not by incomparable
  scores). Contributions are scaled-integer ``1e12 // (K + rank)`` so the
  fused score is bit-exact cross-engine; documents and embeddings share the
  id space (vec_id == doc_id, one vector per document).
- ``graph_label_propagation``: synchronous label propagation (Raghavan et
  al. 2007) over the co-purchase graph with the deterministic tie-break
  (most-frequent neighbor label, smallest label wins) that makes the
  iterative distributed result reproducible and oracle-comparable. The
  per-round shape — join labels to edges, count (node, label), pick the
  argmax per node — is one shuffle per round on the vertex key.

Reference parity note: the reference (SURVEY.md §0) has no retrieval or
graph surface; these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .graph2 import _copurchase_edges
from .retrieval3 import _BM25_ORACLE, bm25_scored
from .relational import tbl
from .similarity import N_QUERIES, _unit_vectors

# ---------------------------------------------------------------------------
# retrieval_rrf_hybrid
# ---------------------------------------------------------------------------

RRF_K = 60  # the standard reciprocal-rank damping constant
RRF_LEG_TOPK = 50  # per-leg candidate depth
RRF_TOPK = 20  # fused result depth
RRF_SCALE = 1_000_000_000_000  # 1/(K+r) -> RRF_SCALE // (K+r), integer-exact
RRF_QUERY_VEC = 0  # the semantic query: vector 0 (first of the query block)

_COS_DUCK = f"""
    WITH e0 AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
      FROM embeddings
    ),
    e AS (SELECT * FROM e0 WHERE nrm > 0),
    sem_scored AS (
      SELECT c.vec_id AS doc_id,
             CAST(ROUND(list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i]))
                        / (q.nrm * c.nrm), 6) AS DOUBLE) AS cos_sim
      FROM e q JOIN e c ON q.vec_id = {RRF_QUERY_VEC} AND c.vec_id <> q.vec_id
    )
"""


@register(
    "retrieval_rrf_hybrid",
    oracle=f"""
    {_COS_DUCK},
    lex50 AS (
      SELECT doc_id, score_scaled,
             ROW_NUMBER() OVER (ORDER BY score_scaled DESC, doc_id) AS lex_rank
      FROM ({_BM25_ORACLE}) b
    ),
    sem50 AS (
      SELECT doc_id, cos_sim,
             ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS sem_rank
      FROM (SELECT * FROM sem_scored
            ORDER BY cos_sim DESC, doc_id LIMIT {RRF_LEG_TOPK}) s
    ),
    fused AS (
      SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
             l.lex_rank, s.sem_rank,
             COALESCE({RRF_SCALE} // ({RRF_K} + l.lex_rank), 0)
             + COALESCE({RRF_SCALE} // ({RRF_K} + s.sem_rank), 0) AS rrf_scaled
      FROM lex50 l FULL OUTER JOIN sem50 s USING (doc_id)
    )
    SELECT doc_id, lex_rank, sem_rank, rrf_scaled
    FROM fused ORDER BY rrf_scaled DESC, doc_id LIMIT {RRF_TOPK}
    """,
    description=f"Hybrid search: BM25 and cosine top-{RRF_LEG_TOPK} lists fused by "
    f"reciprocal rank (K={RRF_K}), integer-exact, top-{RRF_TOPK}",
    tags=("retrieval", "hybrid", "extension"),
)
def retrieval_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse + dense legs fused by rank; ranks only exist on bounded sets.

    Scale plan: each leg reduces the corpus with TakeOrderedAndProject
    (top-{RRF_LEG_TOPK} — no global sort, no unbounded window); rank
    assignment on the bounded result is a window-FREE sorted-array
    aggregate (collect <= {RRF_LEG_TOPK} structs into one array, sort,
    posexplode — the one-row-aggregate plan class, same boundedness
    argument as a driver-side prefix fold). The fusion join is a full
    outer between two <= {RRF_LEG_TOPK}-row sets — broadcastable noise.
    Multi-query fusion swaps the array aggregate for a window partitioned
    by query_id and nothing else changes.
    """

    def ranked(df_topk: DataFrame, neg_key, rank_name: str) -> DataFrame:
        # Bounded-set ranking without a window: one sorted-array aggregate.
        # Struct fields compare in order: (ascending neg_key = descending
        # score, then doc_id ascending) — the same total order as the leg's
        # ORDER BY. Empty leg -> empty array -> zero rows.
        arr = df_topk.agg(
            F.sort_array(F.collect_list(F.struct(neg_key.alias("k"), "doc_id"))).alias("a")
        )
        return arr.select(F.posexplode("a").alias("pos", "s")).select(
            F.col("s.doc_id").alias("doc_id"),
            (F.col("pos") + 1).cast("bigint").alias(rank_name),
        )

    # lexical leg: BM25 top-k, then ranks on the bounded result
    lex50 = (
        bm25_scored(spark, sf_dir)
        .select("doc_id", F.col("score_scaled").cast("bigint").alias("score_scaled"))
        .orderBy(F.col("score_scaled").desc(), "doc_id")
        .limit(RRF_LEG_TOPK)
    )
    lex = ranked(lex50, -F.col("score_scaled"), "lex_rank")

    # semantic leg: cosine vs the fixed query vector, top-k, then ranks
    e = _unit_vectors(tbl(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") == RRF_QUERY_VEC).alias("q")
    c = e.alias("c")
    cos = F.round(
        F.expr("aggregate(zip_with(q.v, c.v, (x, y) -> x * y), 0D, (acc, p) -> acc + p)")
        / (F.col("q.nrm") * F.col("c.nrm")),
        6,
    ).cast("double")
    sem50 = (
        c.join(F.broadcast(q), F.col("c.vec_id") != F.col("q.vec_id"))
        .select(F.col("c.vec_id").alias("doc_id"), cos.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "doc_id")
        .limit(RRF_LEG_TOPK)
    )
    sem = ranked(sem50, -F.col("cos_sim"), "sem_rank")

    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "sem_rank",
        (
            F.coalesce(F.expr(f"{RRF_SCALE} div ({RRF_K} + lex_rank)"), F.lit(0).cast("bigint"))
            + F.coalesce(F.expr(f"{RRF_SCALE} div ({RRF_K} + sem_rank)"), F.lit(0).cast("bigint"))
        ).alias("rrf_scaled"),
    )
    return fused.orderBy(F.col("rrf_scaled").desc(), "doc_id").limit(RRF_TOPK)


# ---------------------------------------------------------------------------
# graph_label_propagation
# ---------------------------------------------------------------------------

LPA_ROUNDS = 3


def _lpa_round_oracle(prev: str, out: str) -> str:
    """One synchronous LPA round as a CTE pair: neighbor-label counts, then
    the (count DESC, label ASC) argmax per node."""
    return f"""
    {out}_cnt AS (
      SELECT e.src AS node, p.lbl, COUNT(*) AS cnt
      FROM edges e JOIN {prev} p ON p.node = e.dst
      GROUP BY e.src, p.lbl
    ),
    {out} AS (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               ROW_NUMBER() OVER (PARTITION BY node ORDER BY cnt DESC, lbl) AS rk
        FROM {out}_cnt
      ) WHERE rk = 1
    )"""


@register(
    "graph_label_propagation",
    oracle=f"""
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
    {",".join(_lpa_round_oracle(f"l{i}", f"l{i + 1}") for i in range(LPA_ROUNDS))}
    SELECT lbl AS community, COUNT(*) AS n_members,
           MIN(node) AS min_node, MAX(node) AS max_node
    FROM l{LPA_ROUNDS}
    GROUP BY lbl
    """,
    description=f"Synchronous label propagation, {LPA_ROUNDS} rounds, "
    "deterministic (count DESC, label ASC) tie-break; community roster summary",
    tags=("graph", "iterative", "extension"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle per round, all on the vertex key.

    Scale plan: labels join edges on ``dst`` (the edge list is shuffled on
    dst once and every round reuses that layout), the (node, label) count
    is map-side combined, and the per-node argmax is a window partitioned
    by node — never a global window. The tie-break (count DESC, label ASC)
    is total, so the synchronous update is deterministic — the property
    that lets the unrolled-CTE oracle and the distributed run agree bit
    for bit. Rounds are a compile-time constant (fixed 3-join plan); a
    convergence-driven variant iterates with localCheckpoint every few
    rounds exactly as dedup_clusters does. Community summary output keeps
    the result a roster digest (count + id range per community) rather
    than corpus-sized.
    """
    und = _copurchase_edges(spark, sf_dir)  # a < b, support-2 co-purchase
    # Persist the directed edge list: every round joins against it — without
    # this the support-2 mining re-runs per round (measured 4.3 s -> ~2 s at
    # sf0.1). At warehouse scale the edge list is materialized once.
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
    return labels.groupBy(F.col("lbl").alias("community")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").alias("min_node"),
        F.max("node").alias("max_node"),
    )
