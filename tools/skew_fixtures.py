"""Build a heavily SKEWED dataset and parity-sweep every query on it.

Third adversarial axis (after edge values and empty tables): hot keys.
A 100 TB corpus is never uniform — one user produces half the clickstream,
one boilerplate page is crawled 100k times, one template embedding repeats
across a scrape, one source dominates the mix. Skew is where distributed
plans diverge from single-node oracles (tie-breaking under mass duplication,
per-group state explosions, degenerate LSH buckets, pair-count blowups) and
where guards/caps first fire. This tool makes that hunt systematic: copy
sf0.001 and inject concentrated mass, then run the standard parity harness.

Injected skew (kept BELOW every documented cap — MAX_SHINGLE_DF 10k,
MAX_BAND_BUCKET 1k, DEDUP_COSINE_MAX_ROWS 200k — so parity must stay exact;
a divergence on this data is a real bug, not a tripped guard):

- events: user 4242 receives ~50% of all rows (cloned from the base table
  with fresh event_ids and jittered timestamps — one giant window/session
  partition), plus a burst of 200 'click' events in one minute (hot
  event_type x hot time bucket).
- documents: one boilerplate paragraph appears 120x verbatim from a 'mirror'
  source (C(120,2)=7140 identical-pair blowup through every near-dup path;
  hot fingerprint buckets; one dominating source for the mixing/sampling
  family), plus 30 docs that are the boilerplate with one word changed
  (near-identical cluster, not just exact-dup).
- embeddings: one template vector cloned 100x (degenerate semantic cell:
  every cosine is 1.0 — cell assignment, LSH buckets and dup_of tie-breaks
  all collapse onto one key), plus 40 small perturbations of it.
- lineitem: one hot order (o_orderkey cloned to 80 line items with distinct
  linenumbers) — a single orderkey carrying 40x the average join fan-out.

Usage:
    python tools/skew_fixtures.py [outdir]        # build only (default /tmp/sfskew)
    python tools/parity.py /tmp/sfskew            # full sweep
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.001"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfskew"

BOILERPLATE = (
    "subscribe to our newsletter for the latest updates terms of service "
    "privacy policy all rights reserved copyright contact us about careers "
    "cookie settings do not sell my personal information site map help center"
)


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    for t in ["region", "nation", "customer", "supplier", "part", "orders"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")

    # lineitem: clone the first order's first line to 80 lines under a fresh,
    # collision-free orderkey (max+1000), distinct linenumbers; quantities
    # cycle 1..10 so aggregates over the hot order are not all-equal.
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SRC}/lineitem.parquet')
          UNION ALL BY NAME
          SELECT * REPLACE (
                   (SELECT MAX(l_orderkey) + 1000 FROM read_parquet('{SRC}/lineitem.parquet')) AS l_orderkey,
                   g.i AS l_linenumber,
                   CAST(1 + (g.i % 10) AS DECIMAL(12,2)) AS l_quantity)
          FROM (SELECT * FROM read_parquet('{SRC}/lineitem.parquet')
                ORDER BY l_orderkey, l_linenumber LIMIT 1) base,
               (SELECT UNNEST(range(1, 81)) AS i) g
        ) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)
        """
    )

    # events: ~50% hot user. Clone every base row to user 4242 with fresh ids
    # (base max + row number) and +1..N second jitter (monotone per clone, so
    # the hot user's stream has distinct, ordered timestamps), then one
    # 200-event click burst inside a single minute.
    con.execute(
        f"""
        COPY (
          WITH base AS (SELECT * FROM read_parquet('{SRC}/events.parquet')),
               mx AS (SELECT MAX(event_id) AS m FROM base)
          SELECT * FROM base
          UNION ALL BY NAME
          SELECT (SELECT m FROM mx) + ROW_NUMBER() OVER (ORDER BY event_id) AS event_id,
                 ts + INTERVAL 1 SECOND * (ROW_NUMBER() OVER (ORDER BY event_id)) AS ts,
                 4242 AS user_id, event_type, value, props
          FROM base
          UNION ALL BY NAME
          SELECT (SELECT m FROM mx) + 100000 + g.i AS event_id,
                 TIMESTAMP '2024-01-20 09:30:00' + INTERVAL 1 SECOND * (g.i % 60) AS ts,
                 4242 AS user_id, 'click' AS event_type,
                 CAST(g.i AS DOUBLE) / 100 AS value, '{{}}' AS props
          FROM (SELECT UNNEST(range(1, 201)) AS i) g
        ) TO '{OUT}/events.parquet' (FORMAT PARQUET)
        """
    )

    # documents: 120 verbatim boilerplate copies + 30 one-word variants, all
    # from a 'mirror' source that thereby dominates the source distribution.
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SRC}/documents.parquet')
          UNION ALL BY NAME
          SELECT 800000 + g.i AS doc_id, '{BOILERPLATE}' AS text,
                 'en' AS lang, 'mirror' AS source,
                 CAST(LENGTH('{BOILERPLATE}') AS BIGINT) AS n_chars
          FROM (SELECT UNNEST(range(1, 121)) AS i) g
          UNION ALL BY NAME
          SELECT 810000 + g.i AS doc_id,
                 REPLACE('{BOILERPLATE}', 'newsletter', 'bulletin ' || g.i) AS text,
                 'en' AS lang, 'mirror' AS source,
                 CAST(LENGTH(REPLACE('{BOILERPLATE}', 'newsletter', 'bulletin ' || g.i)) AS BIGINT) AS n_chars
          FROM (SELECT UNNEST(range(1, 31)) AS i) g
        ) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
        """
    )

    # embeddings: 100 clones of one template vector (cosine exactly 1.0 in
    # every pair) + 40 perturbations of it (first component nudged).
    con.execute(
        f"""
        COPY (
          WITH base AS (SELECT * FROM read_parquet('{SRC}/embeddings.parquet')),
               tmpl AS (SELECT embedding FROM base ORDER BY vec_id LIMIT 1)
          SELECT * FROM base
          UNION ALL BY NAME
          SELECT 700000 + g.i AS vec_id, (SELECT embedding FROM tmpl) AS embedding,
                 7 AS label
          FROM (SELECT UNNEST(range(1, 101)) AS i) g
          UNION ALL BY NAME
          SELECT 710000 + g.i AS vec_id,
                 list_transform(
                   (SELECT embedding FROM tmpl),
                   x -> CAST(x + 0.001 * g.i AS FLOAT)) AS embedding,
                 7 AS label
          FROM (SELECT UNNEST(range(1, 41)) AS i) g
        ) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)
        """
    )

    for t in ["events", "documents", "embeddings", "lineitem"]:
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")
    hot = con.execute(
        f"SELECT COUNT(*) FILTER (user_id = 4242), COUNT(*) FROM read_parquet('{OUT}/events.parquet')"
    ).fetchone()
    print(f"hot-user share: {hot[0]}/{hot[1]} = {hot[0]/hot[1]:.1%}")


if __name__ == "__main__":
    main()
