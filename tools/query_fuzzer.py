"""Generative differential testing: random ANSI queries, Spark vs DuckDB.

Per-operator oracles prove the queries we WROTE are right; this tool hunts
the queries we did not write. A seeded generator builds random
filter/project/join/aggregate queries from an ANSI-portable grammar, runs
the SAME SQL text through Spark SQL (Catalyst + distributed exec, 32
shuffle partitions) and DuckDB (single-node), and compares results with the
parity harness's canonicalizer. Any mismatch is either an engine-semantics
divergence we must fence (like the arg_max/NULL-ordering classes the edge
sweep found) or a real bug.

The grammar deliberately stays inside the exactly-portable subset the
registry's determinism rules define:
- integer / string / timestamp comparisons, AND/OR/NOT, IN lists, BETWEEN
- integer arithmetic (+ - *), string upper/lower/substr/length/||,
  CASE WHEN
- aggregates: COUNT(*), COUNT(col), COUNT(DISTINCT col), MIN/MAX on
  int/string/timestamp, SUM over ints and over CAST(... AS DECIMAL(18,6))
- GROUP BY on 1-2 low-cardinality keys; equi-join lineitem x orders
Floats never enter an accumulator (only decimal-quantized), division and
LIMIT-without-total-order are excluded by construction.

Usage:
    python tools/query_fuzzer.py [n_cases=100] [seed0=0] [sf_dir]
Exit code 1 if any case diverges; prints each failing query.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
STR_COLS = ["l_returnflag", "l_linestatus"]
DEC_COLS = ["l_quantity", "l_extendedprice", "l_discount"]
TS_COL = "l_shipdate"
O_INT = ["o_orderkey", "o_custkey"]
O_STR = ["o_orderstatus", "o_orderpriority"]

FLAGS = ["A", "N", "R"]
STATUS = ["F", "O"]
DATES = ["1995-06-17", "1996-01-01", "1996-09-30", "1997-03-15"]


def _int_expr(rng: random.Random, cols) -> str:
    c = rng.choice(cols)
    match rng.randrange(4):
        case 0:
            return c
        case 1:
            return f"({c} + {rng.randrange(1, 100)})"
        case 2:
            return f"({c} * {rng.randrange(2, 9)})"
        case _:
            return f"({c} % {rng.randrange(2, 50)})"


def _str_expr(rng: random.Random, cols) -> str:
    c = rng.choice(cols)
    match rng.randrange(4):
        case 0:
            return c
        case 1:
            return f"lower({c})"
        case 2:
            return f"substr({c} || '_' || {c}, 1, {rng.randrange(1, 4)})"
        case _:
            return f"(CASE WHEN length({c}) >= 1 THEN upper({c}) ELSE '-' END)"


def _pred(rng: random.Random, int_cols, str_cols, str_vals, ts_col=TS_COL) -> str:
    match rng.randrange(6):
        case 0:
            return f"{rng.choice(int_cols)} {rng.choice(['<', '<=', '>', '>=', '=', '<>'])} {rng.randrange(0, 6000)}"
        case 1:
            vals = ", ".join(f"'{v}'" for v in rng.sample(str_vals, rng.randrange(1, len(str_vals))))
            return f"{rng.choice(str_cols)} IN ({vals})"
        case 2:
            lo = rng.randrange(0, 3000)
            return f"{rng.choice(int_cols)} BETWEEN {lo} AND {lo + rng.randrange(100, 2000)}"
        case 3:
            return f"{ts_col} {rng.choice(['<', '>='])} TIMESTAMP '{rng.choice(DATES)} 00:00:00'"
        case 4:
            return f"NOT ({_pred(rng, int_cols, str_cols, str_vals, ts_col)})"
        case _:
            a = _pred(rng, int_cols, str_cols, str_vals, ts_col)
            b = _pred(rng, int_cols, str_cols, str_vals, ts_col)
            return f"({a} {rng.choice(['AND', 'OR'])} {b})"


def _agg(rng: random.Random, int_cols, str_cols, alias: str) -> str:
    match rng.randrange(6):
        case 0:
            return f"COUNT(*) AS {alias}"
        case 1:
            return f"COUNT(DISTINCT {rng.choice(int_cols + str_cols)}) AS {alias}"
        case 2:
            return f"{rng.choice(['MIN', 'MAX'])}({rng.choice(int_cols + str_cols)}) AS {alias}"
        case 3:
            # CAST: DuckDB SUM(BIGINT) widens to HUGEINT (float64 via
            # pandas) while Spark stays BIGINT — the one dtype divergence
            # the first 100-seed run surfaced; the registry's cast-the-sum
            # convention resolves it.
            return f"CAST(SUM({_int_expr(rng, int_cols)}) AS BIGINT) AS {alias}"
        case 4:
            d = rng.choice(DEC_COLS)
            return f"CAST(SUM(CAST({d} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"
        case _:
            return f"MIN({TS_COL}) AS {alias}"


def _window_query(rng: random.Random) -> str:
    """Window functions over a deterministic total order (unique tiebreak —
    the registry's ranking rule; without it running-aggregate row values on
    tied sort keys are engine-defined). Windows run on ORDERS because its
    o_orderkey is genuinely unique — the fuzzer itself caught that this
    testdata's lineitem has ~1.1k duplicate (l_orderkey, l_linenumber)
    pairs, which made a running MIN legitimately diverge (seed 139)."""
    part = rng.choice(O_STR)
    order = "o_orderkey"  # unique
    exprs = []
    for i in range(rng.randrange(1, 3)):  # widened round 7: 1-2 window cols
        kind = rng.randrange(8)
        if kind == 0:
            win, cast = rng.choice(["ROW_NUMBER()", "RANK()", "DENSE_RANK()"]), "BIGINT"
            frame = ""
        elif kind == 1:
            win, cast = rng.choice(["COUNT(*)", "SUM(o_custkey)", "MIN(o_custkey)"]), "BIGINT"
            frame = " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        elif kind == 2:
            # bounded sliding ROWS frame (round 7): preceding/following offsets
            lo, hi = rng.randrange(0, 4), rng.randrange(0, 4)
            win, cast = rng.choice(["COUNT(*)", "SUM(o_custkey)", "MAX(o_custkey)"]), "BIGINT"
            frame = f" ROWS BETWEEN {lo} PRECEDING AND {hi} FOLLOWING"
        elif kind == 3:
            # navigation with explicit default (NULL default also portable)
            off = rng.randrange(1, 4)
            dflt = rng.choice(["0", "NULL"])
            win, cast = f"{rng.choice(['LAG', 'LEAD'])}(o_custkey, {off}, {dflt})", "BIGINT"
            frame = ""
        elif kind == 4:
            win, cast = f"NTILE({rng.randrange(2, 6)})", "BIGINT"
            frame = ""
        elif kind == 5:
            # deterministic on the unique order column; frame pinned — the
            # default window frame for FIRST_VALUE differs in edge cases
            win, cast = "FIRST_VALUE(o_custkey)", "BIGINT"
            frame = " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        elif kind == 6:
            # exact rational of two ints — identical double in both engines
            win, cast = rng.choice(["PERCENT_RANK()", "CUME_DIST()"]), "DOUBLE"
            frame = ""
        else:
            win, cast = "SUM(CAST(o_totalprice AS DECIMAL(18,2)))", "DOUBLE"
            frame = " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        # CAST the whole window expression — real portability classes the
        # fuzzer surfaced: DuckDB widens window SUM(BIGINT) to HUGEINT (like
        # plain SUM), and Spark's ROW_NUMBER/RANK/DENSE_RANK/NTILE return
        # INT32 where DuckDB returns BIGINT. The registry's cast-the-rank/
        # cast-the-sum conventions fence both.
        exprs.append(
            f"CAST({win} OVER (PARTITION BY {part} ORDER BY {order}{frame}) AS {cast}) AS w{i}"
        )
    where = _pred(
        rng, O_INT, O_STR, STATUS + ["1-URGENT", "2-HIGH", "3-MEDIUM"], ts_col="o_orderdate"
    )
    return f"SELECT o_orderkey, {part}, {', '.join(exprs)} FROM orders WHERE {where}"


def _subquery_query(rng: random.Random) -> str:
    inner_pred = _pred(
        rng, O_INT, O_STR, STATUS + ["1-URGENT", "2-HIGH", "3-MEDIUM"], ts_col="o_orderdate"
    )
    outer_pred = _pred(rng, INT_COLS, STR_COLS, FLAGS + STATUS)
    shape = rng.choice(["EXISTS", "NOT EXISTS", "IN"])
    if shape == "IN":
        sub = f"l_orderkey IN (SELECT o_orderkey FROM orders WHERE {inner_pred})"
    else:
        sub = (
            f"{shape} (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey "
            f"AND {inner_pred})"
        )
    return (
        f"SELECT l_returnflag, COUNT(*) AS m0, "
        f"CAST(SUM(l_linenumber) AS BIGINT) AS m1 "
        f"FROM lineitem WHERE {outer_pred} AND {sub} GROUP BY l_returnflag"
    )


def _setop_query(rng: random.Random) -> str:
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    p1 = _pred(rng, INT_COLS, STR_COLS, FLAGS + STATUS)
    p2 = _pred(rng, INT_COLS, STR_COLS, FLAGS + STATUS)
    cols = "l_orderkey, l_linenumber, l_returnflag"
    return (
        f"SELECT {cols} FROM lineitem WHERE {p1} "
        f"{op} SELECT {cols} FROM lineitem WHERE {p2}"
    )


def _doc_query(rng: random.Random) -> str:
    """String-function shapes over documents — the table that carries
    NULL/empty/unicode text in the edge fixtures, so running this grammar
    against /tmp/sfedge probes cross-engine unicode semantics (codepoint
    length, case mapping, binary collation) that TPC-H columns never hit."""
    langs = ["en", "de", "es", "fr", "zh"]
    sources = ["web", "wiki", "books", "code", "edge", "mirror"]
    preds = []
    for _ in range(rng.randrange(1, 3)):
        match rng.randrange(4):
            case 0:
                preds.append(f"length(text) {rng.choice(['<', '>=', '>'])} {rng.randrange(0, 400)}")
            case 1:
                vals = ", ".join(f"'{v}'" for v in rng.sample(langs, rng.randrange(1, 4)))
                preds.append(f"lang IN ({vals})")
            case 2:
                lo = rng.randrange(0, 300)
                preds.append(f"n_chars BETWEEN {lo} AND {lo + rng.randrange(50, 400)}")
            case _:
                vals = ", ".join(f"'{v}'" for v in rng.sample(sources, rng.randrange(1, 4)))
                preds.append(f"source IN ({vals})")
    where = " AND ".join(preds)
    if rng.random() < 0.5:
        key = rng.choice(["lang", "source"])
        aggs = rng.sample(
            [
                "COUNT(*) AS m0",
                "COUNT(text) AS m1",  # NULL-skipping count
                "CAST(SUM(length(text)) AS BIGINT) AS m2",
                "CAST(MIN(length(text)) AS BIGINT) AS m3",  # length() is INT32 in Spark, BIGINT in DuckDB
                "COUNT(DISTINCT substr(text, 1, 2)) AS m4",
            ],
            rng.randrange(1, 4),
        )
        return f"SELECT {key}, {', '.join(aggs)} FROM documents WHERE {where} GROUP BY {key}"
    return (
        f"SELECT doc_id, CAST(length(text) AS BIGINT) AS c0, lower(substr(text, 1, {rng.randrange(1, 9)})) AS c1, "
        f"(CASE WHEN text IS NULL THEN '-' ELSE 'y' END) AS c2 "
        f"FROM documents WHERE {where}"
    )


def _rollup_query(rng: random.Random) -> str:
    """GROUP BY ROLLUP/CUBE shapes. Two portability conventions baked in
    (both found by earlier sweeps / registry hardening): (1) HAVING
    COUNT(*) > 0 — Spark emits NO rows on an empty input where standard
    SQL emits the () grand-total row, and a WHERE clause can make any
    input empty; (2) GROUPING() is cast — Spark returns it as a narrow
    int, DuckDB as BIGINT."""
    keys = rng.sample(["l_returnflag", "l_linestatus", "l_linenumber"], rng.randrange(1, 3))
    if len(keys) >= 2 and rng.random() < 0.4:
        # explicit GROUPING SETS (round 7): a random non-empty subset of the
        # power set, always including the full key tuple so every key column
        # is grouped at least once
        subsets = [tuple(keys)]
        for cand in [(keys[0],), (keys[1],), ()]:
            if rng.random() < 0.6:
                subsets.append(cand)
        sets_sql = ", ".join("(" + ", ".join(s) + ")" for s in subsets)
        group = f"GROUPING SETS ({sets_sql})"
    else:
        group = f"{rng.choice(['ROLLUP', 'CUBE'])}({', '.join(keys)})"
    aggs = [_agg(rng, INT_COLS, STR_COLS, f"m{i}") for i in range(rng.randrange(1, 3))]
    gsel = ", ".join(f"CAST(GROUPING({k}) AS BIGINT) AS g_{k}" for k in keys)
    where = _pred(rng, INT_COLS, STR_COLS, FLAGS + STATUS)
    return (
        f"SELECT {', '.join(keys)}, {gsel}, {', '.join(aggs)} "
        f"FROM lineitem WHERE {where} "
        f"GROUP BY {group} HAVING COUNT(*) > 0"
    )


def _join_null_query(rng: random.Random) -> str:
    """Join-type x null-handling axes (round-7 verdict item 9): outer joins
    over keys with CONSTRUCTED NULLs (NULLIF on a modulus, so every fixture
    exercises the axis) and heavy duplicates (small modulus), `=` vs
    IS NOT DISTINCT FROM, semi/anti via EXISTS under duplicates, and the
    three-valued IN / NOT IN against a NULL-laden subquery. Conventions
    baked in: EXISTS correlations stay equality-only (Spark cannot
    decorrelate a non-equality correlated predicate, so the null-safe
    comparison axis rides the explicit JOINs); aggregates over outer joins
    count both COUNT(*) and COUNT(nullable) so null-extension rows are
    load-bearing in the compare."""
    k1, m1 = rng.randrange(40, 400), rng.randrange(0, 40)
    k2, m2 = rng.randrange(40, 400), rng.randrange(0, 40)
    pa = _pred(rng, INT_COLS, STR_COLS, FLAGS + STATUS)
    pb = _pred(
        rng, O_INT, O_STR, STATUS + ["1-URGENT", "2-HIGH", "3-MEDIUM"], ts_col="o_orderdate"
    )
    cte = (
        f"WITH a AS (SELECT NULLIF(l_orderkey % {k1}, {m1}) AS ak, "
        f"l_linenumber AS av, l_returnflag AS tag FROM lineitem WHERE {pa}), "
        f"b AS (SELECT NULLIF(o_orderkey % {k2}, {m2}) AS bk, o_custkey AS bv "
        f"FROM orders WHERE {pb}) "
    )
    shape = rng.randrange(5)
    if shape == 0:  # join flavors x (= | null-safe) under NULL keys + dups
        jt = rng.choice(["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"])
        eq = rng.choice(["a.ak = b.bk", "a.ak IS NOT DISTINCT FROM b.bk"])
        return cte + (
            f"SELECT tag, COUNT(*) AS m0, COUNT(b.bk) AS m1, "
            f"CAST(SUM(COALESCE(b.bv, -1)) AS BIGINT) AS m2, "
            f"COUNT(DISTINCT a.ak) AS m3 "
            f"FROM a {jt} b ON {eq} GROUP BY tag"
        )
    if shape == 1:  # semi under duplicates: one output row per a row
        return cte + (
            f"SELECT tag, COUNT(*) AS m0, CAST(SUM(av) AS BIGINT) AS m1 FROM a "
            f"WHERE EXISTS (SELECT 1 FROM b WHERE a.ak = b.bk) GROUP BY tag"
        )
    if shape == 2:  # anti: NULL keys never match '=' so they all survive
        return cte + (
            f"SELECT tag, COUNT(*) AS m0, COUNT(ak) AS m1 FROM a "
            f"WHERE NOT EXISTS (SELECT 1 FROM b WHERE a.ak = b.bk) GROUP BY tag"
        )
    if shape == 3:  # three-valued IN / NOT IN vs a NULL-laden key set
        neg = rng.choice(["", "NOT "])
        return cte + (
            f"SELECT tag, COUNT(*) AS m0 FROM a "
            f"WHERE ak {neg}IN (SELECT bk FROM b) GROUP BY tag"
        )
    # INTERSECT/EXCEPT [ALL] on nullable keys: NULLs compare equal here
    op = rng.choice(["INTERSECT", "EXCEPT", "INTERSECT ALL", "EXCEPT ALL"])
    return cte + f"SELECT ak FROM a {op} SELECT bk FROM b"


def gen_query(seed: int) -> str:
    rng = random.Random(seed)
    shape = rng.random()
    if shape < 0.10:
        return _rollup_query(rng)
    if shape < 0.18:
        return _window_query(rng)
    if shape < 0.24:
        return _subquery_query(rng)
    if shape < 0.34:
        return _setop_query(rng)
    if shape < 0.44:
        return _doc_query(rng)
    if shape < 0.54:
        return _join_null_query(rng)
    joined = rng.random() < 0.4
    if joined:
        int_cols = INT_COLS + O_INT
        str_cols = STR_COLS + O_STR
        str_vals = FLAGS + STATUS + ["1-URGENT", "2-HIGH", "3-MEDIUM"]
        frm = "lineitem JOIN orders ON l_orderkey = o_orderkey"
    else:
        int_cols, str_cols, str_vals = INT_COLS, STR_COLS, FLAGS + STATUS
        frm = "lineitem"
    where = _pred(rng, int_cols, str_cols, str_vals)
    if rng.random() < 0.7:  # aggregate query
        n_keys = rng.randrange(0, 3)
        keys = rng.sample(
            STR_COLS + (["o_orderstatus", "o_orderpriority"] if joined else []) + ["l_linenumber"],
            n_keys,
        )
        aggs = [_agg(rng, int_cols, str_cols, f"m{i}") for i in range(rng.randrange(1, 4))]
        sel = ", ".join(keys + aggs)
        group = f" GROUP BY {', '.join(keys)}" if keys else ""
        having = ""
        if keys and rng.random() < 0.3:
            having = f" HAVING COUNT(*) > {rng.randrange(0, 5)}"
        return f"SELECT {sel} FROM {frm} WHERE {where}{group}{having}"
    # plain filter/project query
    cols = [f"{_int_expr(rng, int_cols)} AS c0", f"{_str_expr(rng, str_cols)} AS c1"]
    if rng.random() < 0.5:
        cols.append(f"{TS_COL} AS c2")
    if rng.random() < 0.5:
        cols.append(
            f"(CASE WHEN {_pred(rng, int_cols, str_cols, str_vals)} THEN 1 ELSE 0 END) AS c3"
        )
    return f"SELECT {', '.join(cols)} FROM {frm} WHERE {where}"


def run_cases(spark, con, parity, n_cases: int, seed0: int) -> list[tuple[int, str, list[str]]]:
    failures = []
    for seed in range(seed0, seed0 + n_cases):
        q = gen_query(seed)
        spark_pdf = spark.sql(q).toPandas()
        duck_pdf = con.execute(q).df()
        problems = parity.compare(f"fuzz{seed}", spark_pdf, duck_pdf)
        if problems:
            failures.append((seed, q, problems))
    return failures


def main():
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "parity", os.path.join(os.path.dirname(os.path.abspath(__file__)), "parity.py")
    )
    argv, sys.argv = sys.argv, ["parity"]
    parity = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(parity)
    sys.argv = argv

    from messikinesisprovider_spark.session import get_spark

    spark = get_spark("fuzzer")
    for t in ["lineitem", "orders", "documents"]:
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).createOrReplaceTempView(t)
    con = parity.duck_connect(sf_dir)

    failures = run_cases(spark, con, parity, n_cases, seed0)
    for seed, q, problems in failures:
        print(f"FUZZ-FAIL seed={seed}\n  {q}")
        for p in problems:
            print(f"    {p}")
    print(f"\n{len(failures)} divergences / {n_cases} random queries (seeds {seed0}..{seed0 + n_cases - 1})")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
