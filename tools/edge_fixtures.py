"""Build an adversarial edge-case dataset and parity-sweep every query on it.

The driver's synthetic tables are clean: no NULL text, no empty strings, no
zero-norm vectors, no unicode. Cross-engine divergences love exactly those
inputs (NULL sort order, NULL-vs-empty tokenization, 0/0 in cosine, codepoint
handling), and each round's external review has found one or two latent cases
of this class. This tool makes the hunt systematic: copy sf0.001, inject the
edges below into the DOMAIN-NULLABLE columns (TPC-H keys/dates/flags stay
non-null per spec — a NULL there is out of contract, not a latent bug), and
run the standard parity harness against the result.

Injected edges:
- documents: NULL text / empty text / whitespace-only / unicode+emoji /
  single-char / exact duplicate of an existing doc / NULL lang+source.
- events: NULL user_id, NULL value, NULL props, duplicate (user_id, ts)
  pairs with distinct event_ids (tiebreak stress), a user with one event,
  and (round 8) NULL ts — the NULLS FIRST/LAST stress for every window
  ordered by time, gap sessionization, and time-bucketed grouping.
- embeddings: the zero vector (norm 0 -> division-by-zero paths), a
  negative-only vector, NULL label.

Usage:
    python tools/edge_fixtures.py [outdir]        # build only
    python tools/parity.py <outdir>               # full sweep
"""

from __future__ import annotations

import datetime
import os
import shutil
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.001"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfedge"


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    # TPC-H tables: copy unchanged (their nullable surface is empty by spec)
    # — except customer, which since round 8 carries NULL dimension fields
    # (mktsegment / acctbal) so blocked-pair and segment-grouping queries
    # exercise the NULL-agreement path (the er_fellegi_sunter class).
    for t in ["region", "nation", "supplier", "part", "orders", "lineitem"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")

    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SRC}/customer.parquet')
          UNION ALL BY NAME
          SELECT * FROM (VALUES
            (900001, 'Customer#000900001', 0, NULL, NULL),
            (900002, 'Customer#000900002', 0, NULL, 'BUILDING'),
            (900003, 'Customer#000900003', 0, -12.34, NULL)
          ) t(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
        ) TO '{OUT}/customer.parquet' (FORMAT PARQUET)
        """
    )

    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SRC}/documents.parquet')
          UNION ALL BY NAME
          SELECT * FROM (VALUES
            (900001, NULL, NULL, NULL, NULL),
            (900002, '', 'en', 'edge', 0),
            (900003, '   ', 'en', 'edge', 3),
            (900004, 'héllo wörld 日本語 🚀 emoji tail', 'de', 'edge', 29),
            (900005, 'x', 'en', 'edge', 1),
            (900006, (SELECT text FROM read_parquet('{SRC}/documents.parquet')
                      WHERE text IS NOT NULL ORDER BY doc_id LIMIT 1),
             'en', 'edge', (SELECT n_chars FROM read_parquet('{SRC}/documents.parquet')
                            WHERE text IS NOT NULL ORDER BY doc_id LIMIT 1))
          ) t(doc_id, text, lang, source, n_chars)
        ) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
        """
    )

    t0 = datetime.datetime(2024, 1, 15, 12, 0, 0)
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SRC}/events.parquet')
          UNION ALL BY NAME
          SELECT * FROM (VALUES
            (900001, TIMESTAMP '{t0}', NULL, 'click',    NULL, NULL),
            (900002, TIMESTAMP '{t0}', NULL, 'error',    1.0,  '{{}}'),
            (900003, TIMESTAMP '{t0}', 777,  'click',    2.5,  NULL),
            (900004, TIMESTAMP '{t0}', 777,  'click',    NULL, '{{}}'),
            (900005, TIMESTAMP '{t0}', 777,  'error',    0.0,  '{{}}'),
            (900006, TIMESTAMP '{t0}', 778,  'purchase', 9.9,  '{{"a":1}}'),
            (900007, TIMESTAMP '{t0}', 779,  NULL,       1.0,  '{{}}'),
            (900008, CAST(NULL AS TIMESTAMP), 777, 'click',    1.5,  '{{}}'),
            (900009, CAST(NULL AS TIMESTAMP), NULL, NULL,      NULL, NULL),
            (900010, CAST(NULL AS TIMESTAMP), 778, 'purchase', 3.3,  '{{}}')
          ) t(event_id, ts, user_id, event_type, value, props)
        ) TO '{OUT}/events.parquet' (FORMAT PARQUET)
        """
    )

    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SRC}/embeddings.parquet')
          UNION ALL BY NAME
          SELECT * FROM (VALUES
            (900001, CAST(list_transform(range(0, 64), i -> 0.0) AS FLOAT[]), NULL),
            (900002, CAST(list_transform(range(0, 64), i -> -0.25) AS FLOAT[]), 7)
          ) t(vec_id, embedding, label)
        ) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    print(f"edge fixtures written to {OUT}")


if __name__ == "__main__":
    main()
