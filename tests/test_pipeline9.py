"""Semantic tests for the round-3i operators (pipeline9.py)."""

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from messikinesisprovider_spark.operators import pipeline9
from messikinesisprovider_spark.operators.relational import tbl

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# percentile_cont_exact
# ---------------------------------------------------------------------------


def _ref_percentile_cont(values, k):
    """PERCENTILE_CONT replicating the operator's exact contract: doubles
    quantized to DECIMAL(18,6) (HALF_UP on the exact binary value), integer
    weighted sum in exact decimal, then the engines' decimal->double cast
    (unscaled / 10^scale in float) and ONE double division by 100."""
    q = Decimal("0.000001")
    vs = sorted(Decimal(float(v)).quantize(q, rounding=ROUND_HALF_UP) for v in values)
    n = len(vs)
    pos = k * (n - 1)  # percent-hundredths
    lo, r = divmod(pos, 100)
    num = (100 - r) * vs[lo] + (r * vs[lo + 1] if r else 0)
    unscaled = int(num * 1_000_000)
    return float(unscaled) / 1_000_000.0 / 100.0


def test_percentile_cont_matches_rational_reference(spark):
    li = tbl(spark, SF, "lineitem").select("l_returnflag", "l_extendedprice").collect()
    groups = {}
    for r in li:
        groups.setdefault(r["l_returnflag"], []).append(r["l_extendedprice"])
    got = {
        (r["flag"], r["percentile"]): (r["n"], r["value_cont"])
        for r in pipeline9.percentile_cont_exact(spark, SF).collect()
    }
    assert len(got) == len(groups) * len(pipeline9.PCTL_KS)
    for (flag, k), (n, v) in got.items():
        assert n == len(groups[flag])
        assert v == _ref_percentile_cont(groups[flag], k)


def test_percentile_cont_constructed_cases(spark, tmp_path):
    # 5 values 10..50: p25 = 20, p50 = 30, p75 = 40, p90 = 46
    sf = str(tmp_path)
    li = tbl(spark, SF, "lineitem")
    rows = [(1, i, float(v)) for i, v in enumerate([10, 20, 30, 40, 50], start=1)]
    base = spark.createDataFrame(rows, "l_orderkey long, l_linenumber int, price double")
    out = base.select(
        "l_orderkey",
        "l_linenumber",
        F.col("price").cast("decimal(12,2)").alias("l_extendedprice"),
        F.lit("A").alias("l_returnflag"),
    )
    filled = out
    for f_ in li.schema.fields:
        if f_.name not in [c for c in out.columns]:
            filled = filled.withColumn(f_.name, F.lit(None).cast(f_.dataType))
    filled.select(*[f_.name for f_ in li.schema.fields]).write.parquet(f"{sf}/lineitem.parquet")
    got = {
        r["percentile"]: r["value_cont"]
        for r in pipeline9.percentile_cont_exact(spark, sf).collect()
    }
    assert got == {25: 20.0, 50: 30.0, 75: 40.0, 90: 46.0}


def test_percentile_cont_single_row_group(spark, tmp_path):
    sf = str(tmp_path)
    li = tbl(spark, SF, "lineitem")
    one = (
        li.limit(1)
        .withColumn("l_returnflag", F.lit("Z"))
        .withColumn("l_extendedprice", F.lit(77.5).cast("decimal(12,2)"))
    )
    one.write.parquet(f"{sf}/lineitem.parquet")
    rows = pipeline9.percentile_cont_exact(spark, sf).collect()
    assert len(rows) == len(pipeline9.PCTL_KS)
    assert all(r["value_cont"] == 77.5 and r["n"] == 1 for r in rows)


# ---------------------------------------------------------------------------
# multimodal_dedup_binary
# ---------------------------------------------------------------------------


def test_media_dedup_finds_planted_copies(spark, tmp_path):
    sf = str(tmp_path)
    docs = [
        (1, "same payload", "en", "a", 12),
        (2, "same payload", "en", "b", 12),  # byte-identical to 1
        (3, "same payload", "en", "c", 12),  # and again
        (4, "unique one", "en", "a", 10),
        (5, None, None, None, None),  # NULL text: no container
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    rows = pipeline9.multimodal_dedup_binary(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_copies"] == 3 and r["canonical_doc_id"] == 1
    # FIMG container: 4 magic + 4 dims + 1 channels + utf-8 payload
    assert r["n_bytes_each"] == 9 + len("same payload".encode())
    assert r["bytes_reclaimable"] == 2 * r["n_bytes_each"]


def test_media_dedup_binary_key_equals_text_key(spark):
    # the oracle's bijection claim: grouping by the binary digest and by
    # md5(text) must induce the same partition of docs
    d = tbl(spark, SF, "documents").filter(F.col("text").isNotNull())
    from messikinesisprovider_spark.operators.multimodal import synthesize_image_column

    imgs = synthesize_image_column(d).join(d.select("doc_id", "text"), "doc_id")
    pairs = imgs.select(
        F.sha2("image", 256).alias("b"), F.md5(F.col("text").cast("binary")).alias("t")
    ).distinct()
    assert (
        pairs.groupBy("b").count().filter(F.col("count") > 1).count() == 0
        and pairs.groupBy("t").count().filter(F.col("count") > 1).count() == 0
    )
