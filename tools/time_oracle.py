#!/usr/bin/env python3
"""Time the DuckDB oracle suite over a data dir — the engine-vs-oracle
ratio denominator for BENCH comparisons (the judge's stable metric:
wall totals shift with host contention, the ratio does not).

Usage: python3 tools/time_oracle.py <sfDir> <verifyOutDir> [threads]
  (<verifyOutDir>/oracle_sql.json from graft.Verify supplies the SQL)

Prints per-query seconds (slowest 15) and ONE summary line:
  ORACLE_TOTAL=<sec> N=<queries> sf=<dir>
"""
import duckdb, json, os, re, sys, time

import selfcheck  # run_staged: the CTE->temp-table capacity mode

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    # ORACLE_STAGED: regex of query names to run through selfcheck's
    # staged executor (results byte-identical; peak footprint bounded
    # one pipeline at a time) — the denominator mode for SFs where the
    # one-shot WITH exceeds the box. ORACLE_MEM raises the 24GB cap.
    staged = (re.compile(os.environ["ORACLE_STAGED"])
              if os.environ.get("ORACLE_STAGED") else None)
    con = duckdb.connect()
    con.sql(f"SET threads={threads}")
    con.sql(f"SET temp_directory='/tmp/duckdb_spill_{os.getpid()}'")
    con.sql(f"SET memory_limit='{os.environ.get('ORACLE_MEM', '24GB')}'")
    con.sql("SET preserve_insertion_order=false")
    for t in TABLES:
        path = f"{sfdir}/{t}.parquet"
        # ** also descends gpart_* day-partition dirs (see selfcheck.py)
        glob = path + ("/**/*.parquet" if os.path.isdir(path) else "")
        con.sql(f"create view {t} as select * from '{glob}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    if len(sys.argv) > 4:  # optional regex filter, like selfcheck.py
        pat = re.compile(sys.argv[4])
        oracle = {k: v for k, v in oracle.items() if pat.search(k)}
    # ORACLE_LANES: run the suite in N concurrent lanes (cursors on
    # the one database, sharing its thread pool) — graft.Bench passes
    # its own lane count here so the published ratio compares equal
    # methodologies (engine lanes share one Spark scheduler the same
    # way). duckdb releases the GIL during execution; each cursor
    # serializes its own queries. Lanes=1 is the old sequential walk.
    lanes = max(1, int(os.environ.get("ORACLE_LANES", "1")))
    times = {}

    def run_one(name, cur):
        t0 = time.time()
        if staged and staged.search(name):
            selfcheck.run_staged(cur, oracle[name])
        else:
            cur.sql(oracle[name]).fetchall()
        times[name] = time.time() - t0
        # stream per-query lines so a long big-sf run shows progress;
        # ONE atomic write (line + newline together): lanes>1 prints
        # from several threads, and print()'s separate newline write
        # can interleave mid-line, garbling the captured log that
        # Bench now parses for per-query oracle walls
        sys.stdout.write(f"{times[name]:9.2f}  {name}\n")
        sys.stdout.flush()

    names = sorted(oracle)
    t_wall = time.time()
    if lanes == 1:
        for name in names:
            run_one(name, con)
        total = sum(times.values())  # == wall, kept for continuity
    else:
        import queue as _q
        import threading
        work = _q.SimpleQueue()
        for name in names:
            work.put(name)
        errs = []

        def drain():
            cur = con.cursor()
            while True:
                try:
                    name = work.get_nowait()
                except _q.Empty:
                    return
                try:
                    run_one(name, cur)
                except Exception as e:  # surface, don't hang the join
                    errs.append((name, e))
        threads = [threading.Thread(target=drain) for _ in range(lanes)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errs:
            raise errs[0][1]
        total = time.time() - t_wall  # wall across lanes, like Bench
    print(f"ORACLE_TOTAL={total:.1f} N={len(times)} sf={sfdir} lanes={lanes}",
          flush=True)


if __name__ == "__main__":
    main()
