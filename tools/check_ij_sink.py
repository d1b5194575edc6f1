#!/usr/bin/env python3
"""Independent DuckDB truth for the ProfileIntervalSink file-sink drive
(r16 verdict item 1): re-derives the outer interval join from the fixture
parquet in DuckDB and diffs the Spark streaming sink output EXACTLY
(sorted full rows) — the same independent-engine truth Verify's oracle
uses, applied to the production-sink path whose outputs exceed the
memory-sink harness's driver bound at cross-scale volumes.

Usage:
  check_ij_sink.py LEFT_DIR RIGHT_DIR SINK_DIR {left_outer|right_outer|full_outer}
"""
import sys

import duckdb

l, r, sink, jt = sys.argv[1:5]
con = duckdb.connect()
con.execute(f"CREATE VIEW l AS SELECT * FROM read_parquet('{l}/*.parquet')")
con.execute(f"CREATE VIEW r AS SELECT * FROM read_parquet('{r}/*.parquet')")
join = {"left_outer": "LEFT JOIN", "right_outer": "RIGHT JOIN",
        "full_outer": "FULL JOIN"}[jt]
# the faces' key semantics: left key for left_outer, coalesced for the
# right/full types (unmatched-right rows keep their key); sentinel rows
# (user_id -1 on both streams) are filtered like the q78/q79/q82 faces
key = "l.user_id" if jt == "left_outer" else "coalesce(l.user_id, r.user_id)"
truth = f"""
SELECT l.event_id, {key} AS user_id, l.ts, l.value,
       r.click_ts, r.click_id, r.click_value
FROM l {join} r
  ON l.user_id = r.user_id
 AND r.click_ts BETWEEN l.ts - INTERVAL 1 DAY AND l.ts
WHERE {key} >= 0
"""
t = con.execute(f"SELECT * FROM ({truth}) ORDER BY ALL").fetchall()
s = con.execute(
    "SELECT event_id, user_id, ts, value, click_ts, click_id, click_value "
    f"FROM read_parquet('{sink}/*.parquet') WHERE user_id >= 0 "
    "ORDER BY ALL").fetchall()
ok = t == s
print(f"ij_sink duckdb check: join={jt} truth_rows={len(t)} "
      f"sink_rows={len(s)} match={ok}")
if not ok:
    import itertools
    td, sd = set(map(tuple, t)), set(map(tuple, s))
    for x in itertools.islice(td - sd, 5):
        print("only-truth:", x)
    for x in itertools.islice(sd - td, 5):
        print("only-sink :", x)
    sys.exit(1)
