#!/usr/bin/env python
"""DuckDB baseline runner — the BASELINE.md protocol at an arbitrary scale
factor: per headline query, one untimed warm-up then the median of 3 timed
runs (fetchall included), SET threads as configured. Prints one JSON line
shaped like graft.Bench's output so the two are directly comparable.

The query texts are the engine's own oracle SQL (oracle_sql.json, written
by `runMain graft.Verify <sf> <out> '^$'` — the no-match filter dumps the
JSON without running queries).

An events.parquet whose ts column is BIGINT (the sf1 generator persists
epoch nanoseconds — see gen_sf1.py) gets a timestamp view derived exactly
like the Spark loader: make_timestamp(ts // 1000).

Usage: python tools/bench_duckdb.py <sf_dir> <oracle_sql.json> [threads]
"""
import json
import os
import statistics
import sys
import time

import duckdb

HEADLINE = [
    "q1_pricing_summary", "q3_top_orders", "semi_anti_join", "window_rank",
    "window_running", "distinct_users", "rollup_sales", "set_ops",
    "string_funcs", "date_trunc_agg", "json_extract", "tumbling_window",
    "session_gap", "exact_dedup_docs", "doc_token_stats", "cosine_topk",
]

# The LLM-pipeline headliners (graft.Bench.llmHeadline twin): benched as a
# separate group with its own total so the 16-key baseline stays
# comparable across rounds. Enabled with --llm (anywhere in argv).
LLM = [
    "minhash_near_dup", "embedding_near_dup", "tfidf_top_terms",
    "pack_sequences", "shuffle_shards", "line_dedup_docs", "semantic_dedup",
]

# The ANN headliners (graft.Bench.annHeadline twin) — wall only; recall
# is the Spark artifact's job (both engines run the same approximation,
# so their result sets match by the correctness gate). --ann enables.
ANN = [
    "ivf_cosine_topk", "ann_hyperplane_topk", "embedding_quantize_topk",
    "ivf_pq_topk",
]

# The curation headliners (graft.Bench.curationHeadline twin). --curation
# enables.
CURATION = [
    "exact_substring_dedup", "url_dedup_normalized",
    "quality_gopher", "quality_c4", "unigram_logprob", "heavy_hitters",
    "quality_tiers", "contamination_fuzzy", "pipeline_curation_v2",
    "stream_quality_gate",
]

args = [a for a in sys.argv[1:] if a not in ("--llm", "--ann", "--curation")]
run_llm = "--llm" in sys.argv
run_ann = "--ann" in sys.argv
run_cur = "--curation" in sys.argv
sf_dir, oracle_path = args[0], args[1]
threads = int(args[2]) if len(args) > 2 else 4
oracle = json.load(open(oracle_path))

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
con.execute(f"SET threads TO {threads}")
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    cols = con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')").fetchall()
    types = {c[0]: c[1] for c in cols}
    if t == "events" and types.get("ts") == "BIGINT":
        con.execute(
            f"CREATE VIEW {t} AS SELECT event_id, "
            f"make_timestamp(ts // 1000) AS ts, user_id, event_type, value, "
            f"props FROM read_parquet('{sf_dir}/{t}.parquet')")
    else:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def bench(names):
    out = {}
    for name in names:
        sql = oracle[name]
        con.execute(sql).fetchall()  # warm-up (OS cache + plan)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
        out[name] = statistics.median(times)
    return out

results = bench(HEADLINE)
total = sum(results.values())
qjson = ",".join(f'"{k}":{v}' for k, v in results.items())
llm_json = ""
if run_llm:
    llm = bench(LLM)
    lq = ",".join(f'"{k}":{v}' for k, v in llm.items())
    llm_json = f',"llm":{{{lq}}},"llm_total":{sum(llm.values())}'
ann_json = ""
if run_ann:
    ann = bench(ANN)
    aq = ",".join(f'"{k}":{v}' for k, v in ann.items())
    ann_json = f',"ann":{{{aq}}},"ann_total":{sum(ann.values())}'
cur_json = ""
if run_cur:
    cur = bench(CURATION)
    cq = ",".join(f'"{k}":{v}' for k, v in cur.items())
    cur_json = f',"curation":{{{cq}}},"curation_total":{sum(cur.values())}'
    # hh_highcard twin: the SAME deterministic zipf-ish generator as
    # graft.Bench's leg (16 hot tokens ~3.1% each + unique md5 tails),
    # naive full-cardinality GROUP BY ... HAVING. Rows honor the SAME
    # env var as the Spark leg (SPARK_GRAFT_HH_ROWS) so one export
    # scales both sides of the comparison.
    n = int(os.environ.get("SPARK_GRAFT_HH_ROWS",
                           os.environ.get("GRAFT_HH_ROWS", "32000000")))
    hh_sql = f"""
      WITH tk AS (
        SELECT CASE WHEN i % 4 < 2 THEN 'hot_' || ((i // 4) % 16)::VARCHAR
                    ELSE 'r_' || md5(i::VARCHAR) END AS tok
        FROM range(0, {n}) t(i))
      SELECT tok FROM tk GROUP BY tok HAVING count(*) >= {n} * 0.02"""
    rows = con.execute(hh_sql).fetchall()
    assert len(rows) == 16, f"hh_highcard twin returned {len(rows)} terms"
    ts = []
    for _ in range(3):
        t0 = time.time()
        con.execute(hh_sql).fetchall()
        ts.append(time.time() - t0)
    ts.sort()
    cur_json += f',"hh_highcard":{{"rows":{n},"naive_groupby_s":{ts[1]}}}'
print(f'{{"metric":"duckdb_total","value":{total},"unit":"sec",'
      f'"queries":{{{qjson}}}{llm_json}{ann_json}{cur_json},"threads":{threads},"sf":"{sf_dir}"}}')
