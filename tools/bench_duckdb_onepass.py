#!/usr/bin/env python
"""DuckDB twin of graft.Bench's one-pass scale smoke: each named key runs
ONCE (no warm-up, no medians — mirrors SPARK_GRAFT_ONEPASS), in its own
subprocess with a hard wall-clock cap, so a key whose naive oracle plan
explodes at scale records a DNF instead of hanging the artifact. The query
texts are the engine's own oracle SQL (the naive semantic spec — DuckDB
gets no scale rewrites here, exactly as Spark's gate queries are the
shapes Bench times).

Usage: python tools/bench_duckdb_onepass.py <sf_dir> <oracle_sql.json> \
         [threads] [cap_sec] [--llm|--curation|--headline]
Output: one JSON line; a capped key reports null and lands in "dnf".
"""
import json
import subprocess
import sys
import time

HEADLINE = [
    "q1_pricing_summary", "q3_top_orders", "semi_anti_join", "window_rank",
    "window_running", "distinct_users", "rollup_sales", "set_ops",
    "string_funcs", "date_trunc_agg", "json_extract", "tumbling_window",
    "session_gap", "exact_dedup_docs", "doc_token_stats", "cosine_topk",
]
LLM = [
    "minhash_near_dup", "embedding_near_dup", "tfidf_top_terms",
    "pack_sequences", "shuffle_shards", "line_dedup_docs", "semantic_dedup",
]
CURATION = [
    "exact_substring_dedup", "url_dedup_normalized",
    "quality_gopher", "quality_c4", "unigram_logprob", "heavy_hitters",
    "quality_tiers", "contamination_fuzzy", "pipeline_curation_v2",
    "stream_quality_gate",
]

WORKER = r"""
import duckdb, json, sys, time
sf_dir, oracle_path, threads, name = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
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
t0 = time.perf_counter()
con.execute(oracle[name]).fetchall()
print(time.perf_counter() - t0)
"""

args = [a for a in sys.argv[1:] if not a.startswith("--")]
sf_dir, oracle_path = args[0], args[1]
threads = int(args[2]) if len(args) > 2 else 4
cap = float(args[3]) if len(args) > 3 else 900.0
names = (LLM if "--llm" in sys.argv
         else CURATION if "--curation" in sys.argv else HEADLINE)

out, dnf = {}, []
for name in names:
    try:
        r = subprocess.run(
            [sys.executable, "-c", WORKER, sf_dir, oracle_path,
             str(threads), name],
            capture_output=True, text=True, timeout=cap)
        if r.returncode == 0:
            out[name] = float(r.stdout.strip().splitlines()[-1])
        else:
            sys.stderr.write(f"[duckdb-onepass] {name} FAILED: {r.stderr[-500:]}\n")
            out[name] = None
            dnf.append(name)
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"[duckdb-onepass] {name} DNF: exceeded {cap}s cap\n")
        out[name] = None
        dnf.append(name)

qjson = ",".join(
    f'"{k}":{v if v is not None else "null"}' for k, v in out.items())
done = [v for v in out.values() if v is not None]
dnfj = ",".join(f'"{k}"' for k in dnf)
print(f'{{"metric":"duckdb_onepass","value":{sum(done)},"unit":"sec",'
      f'"queries":{{{qjson}}},"dnf":[{dnfj}],"cap_sec":{cap},'
      f'"threads":{threads},"sf":"{sf_dir}"}}')
