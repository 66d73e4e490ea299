#!/usr/bin/env python3
"""Oracle CTE-materialization profile (VERDICT r10 #6).

For every catalog oracle, times the SHIPPED spelling against its
materialization FLIP at a given SF:
  - oracles that carry `AS MATERIALIZED` -> also time the stripped
    (re-inlined) variant;
  - oracles without it -> also time a variant with `AS MATERIALIZED`
    injected after every CTE head (skipped for queries with a
    `WINDOW w AS (...)` clause, where the regex would corrupt syntax).

Writes one JSON line per oracle: name, shipped/flipped wall seconds,
whether the shipped spelling carries MATERIALIZED, and the winner.
Slow runs are interrupted at --timeout seconds and recorded as such.

Usage: python3 tools/profile_oracle_mat.py <sfDir> <oracle_sql.json> <out.json>
"""
import sys, json, re, glob, time, threading
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]
TIMEOUT = 120.0

MAT = re.compile(r"\bAS MATERIALIZED\s*\(")
# a CTE head:  name AS (   — only inject when not already materialized
CTE_HEAD = re.compile(r"(\b[A-Za-z_][A-Za-z0-9_]*\s+AS)\s*\(", re.IGNORECASE)


def inject_materialized(sql: str) -> str:
    # WITH ... SELECT: inject only inside the WITH prefix (before the
    # final SELECT at depth 0 is hard to find cheaply; CTE heads only
    # match `name AS (` which cannot appear in the trailing SELECT of
    # these oracles except inside CAST(x AS ...) — the regex requires an
    # identifier then AS then '(' which CAST(... AS BIGINT) never forms).
    def repl(m):
        head = m.group(1)
        if head.upper().endswith("MATERIALIZED AS"):
            return m.group(0)
        return head + " MATERIALIZED ("
    return CTE_HEAD.sub(repl, sql)


def strip_materialized(sql: str) -> str:
    return re.sub(r"\bAS MATERIALIZED\s*\(", "AS (", sql)


def timed(con, sql):
    # done-flag set/read under a lock so a racing Timer can never fire
    # con.interrupt() after the next statement on this connection has
    # started; timeouts are classified by exception TYPE (duckdb's
    # interrupt error), not by wall-clock proximity to the deadline, so
    # a genuine query error near the deadline is recorded as an error.
    lock = threading.Lock()
    done = [False]
    interrupted = [False]
    def interrupt():
        with lock:
            if not done[0]:
                interrupted[0] = True
                con.interrupt()
    t = threading.Timer(TIMEOUT, interrupt)
    t.start()
    t0 = time.time()
    try:
        con.execute(sql).fetchall()
        dt = time.time() - t0
        return dt, "ok"
    except Exception as e:
        dt = time.time() - t0
        # classify under the lock, with done[0] set FIRST: a Timer that
        # races the deadline either already set interrupted[0] (we read
        # it under the same lock) or will observe done[0] and never fire
        # the stale con.interrupt() into the next statement (ADVICE r12)
        with lock:
            done[0] = True
            was_interrupted = interrupted[0]
        is_interrupt = (isinstance(e, getattr(duckdb, "InterruptException",
                                              ())) or was_interrupted)
        kind = "timeout" if is_interrupt else f"err:{type(e).__name__}"
        return dt, kind
    finally:
        with lock:
            done[0] = True
        t.cancel()


def main(sf_dir, oracle_json, out_path):
    oracle = json.load(open(oracle_json))
    oracle = {k: v for k, v in oracle.items() if not k.endswith(".parquet")}
    results = []
    for i, (name, sql) in enumerate(sorted(oracle.items())):
        con = duckdb.connect()
        for t in TABLES:
            if glob.glob(f"{sf_dir}/{t}.parquet"):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        shipped_mat = bool(MAT.search(sql))
        if shipped_mat:
            flip, flip_kind_name = strip_materialized(sql), "inlined"
        elif re.search(r"\bWINDOW\s+\w+\s+AS\s*\(", sql, re.IGNORECASE):
            flip, flip_kind_name = None, "skipped_window_clause"
        else:
            flip, flip_kind_name = inject_materialized(sql), "materialized"
        s_dt, s_st = timed(con, sql)
        if flip is not None:
            f_dt, f_st = timed(con, flip)
        else:
            f_dt, f_st = None, flip_kind_name
        rec = {"name": name, "shipped_mat": shipped_mat,
               "shipped_sec": round(s_dt, 3), "shipped_status": s_st,
               "flip_kind": flip_kind_name,
               "flip_sec": None if f_dt is None else round(f_dt, 3),
               "flip_status": f_st}
        if s_st == "ok" and f_st == "ok":
            rec["winner"] = "shipped" if s_dt <= f_dt else "flip"
            rec["ratio"] = round(f_dt / max(s_dt, 1e-3), 2)
        results.append(rec)
        print(json.dumps(rec), flush=True)
        con.close()
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "timeout_sec": TIMEOUT,
                   "results": results}, f, indent=1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
