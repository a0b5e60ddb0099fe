#!/usr/bin/env python3
"""Fixture-vintage stress: rebuild a variant of an SF dir whose documents
table contains the pathological shapes real fixture regenerations have
shipped (or could ship) — empty text, whitespace-only, 1-3 token docs,
all-stopword docs — then run the full Verify + DuckDB gate against it.

Round 7 died because a fixture regeneration changed the events timestamp
encoding; this harness is the same insurance for the documents table:
every oracle must agree with Spark on degenerate documents BEFORE a
driver regeneration ships them. Found in round 8: x28e fingerprint
(sha256 of NULL vs ''), x41/x46 empty-list joins.

Usage:
    python3 scripts/stress_vintage.py [srcSfDir] [workDir]
    # then:
    sbt -batch "runMain graft.Verify <workDir> /tmp/vout_tiny"
    python3 scripts/check.py <workDir> /tmp/vout_tiny
"""
import duckdb, os, shutil, sys

src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
dst = sys.argv[2] if len(sys.argv) > 2 else '/tmp/sf_tiny'

shutil.rmtree(dst, ignore_errors=True)
os.makedirs(dst)
for f in os.listdir(src):
    if f != 'documents.parquet':
        os.symlink(os.path.join(src, f), os.path.join(dst, f))

con = duckdb.connect()
# pass-through branches SELECT columns BY NAME: UNION ALL matches
# positionally, so a regeneration that reorders same-typed columns
# (lang vs source) would otherwise silently mis-assign them — exactly
# the fixture-vintage drift this harness exists to catch
con.execute(f"""
COPY (
  SELECT doc_id, text, lang, source, n_chars
    FROM read_parquet('{src}/documents.parquet') WHERE doc_id < 20
  UNION ALL
  SELECT * FROM (VALUES
    (9001, '', 'en', 'web', 0),
    (9002, 'x', 'en', 'web', 1),
    (9003, 'a b', 'en', 'wiki', 3),
    (9004, 'the the the the the the', 'en', 'web', 23),
    (9005, 'one two three four five six seven', 'es', 'book', 33),
    (9006, '   ', 'fr', 'web', 3),
    (9007, 'the a and of to in', 'en', 'wiki', 18)
  ) t(doc_id, text, lang, source, n_chars)
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
""")
n, = con.execute(
    f"SELECT count(*) FROM read_parquet('{dst}/documents.parquet')").fetchone()
print(f"wrote {dst}/documents.parquet ({n} docs incl. 7 pathological)")

# embeddings variant: an exact-duplicate vector (keep-lowest-id tie) and
# an all-zero vector (norm 0 → NULL cosine paths) in the index/dedup/ANN
# chains. Symlinked dst shares the file otherwise, so replace the link.
emb_link = os.path.join(dst, 'embeddings.parquet')
os.remove(emb_link)
con.execute(f"""
COPY (
  SELECT vec_id, embedding, label
    FROM read_parquet('{src}/embeddings.parquet') WHERE vec_id < 60
  UNION ALL
  SELECT 9001 AS vec_id, e.embedding, e.label
    FROM read_parquet('{src}/embeddings.parquet') e WHERE e.vec_id = 3
  UNION ALL
  SELECT 9002, list_transform(range(64), i -> CAST(0.0 AS FLOAT)), 0
) TO '{emb_link}' (FORMAT PARQUET)
""")
m, = con.execute(
    f"SELECT count(*) FROM read_parquet('{emb_link}')").fetchone()
print(f"wrote {emb_link} ({m} vectors incl. exact-dup + zero vector)")

# events variant: NULL props (json fns), NULL value (aggregates), an
# unknown event_type (funnel/sessionize must pass it through), and an
# exact-duplicate (user, type, ts) row (keyed dedup ties). Keys the
# queries ORDER BY (event_id, ts, user_id) stay NON-NULL: Spark default
# sort is NULLS FIRST, DuckDB's is NULLS LAST — a null order key is an
# engine-semantics difference, not a robustness gap.
ev_link = os.path.join(dst, 'events.parquet')
os.remove(ev_link)
con.execute(f"""
COPY (
  SELECT event_id, ts, user_id, event_type, value, props
    FROM read_parquet('{src}/events.parquet')
  UNION ALL
  SELECT 900001 AS event_id, ts, user_id, 'refund' AS event_type,
         NULL AS value, NULL AS props
    FROM read_parquet('{src}/events.parquet') WHERE event_id = 10
  UNION ALL
  SELECT 900002, ts, user_id, event_type, value, props
    FROM read_parquet('{src}/events.parquet') WHERE event_id = 11
) TO '{ev_link}' (FORMAT PARQUET)
""")
k, = con.execute(
    f"SELECT count(*) FROM read_parquet('{ev_link}')").fetchone()
print(f"wrote {ev_link} ({k} events incl. NULL props/value + dup row)")
