#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness compare.

Usage: python3 tools/selfcheck.py <sfDir> <outDir>
  (run graft.Verify first to populate <outDir>)

For each query in <outDir>/oracle_sql.json: load the Spark result
parquet, run the oracle SQL against views over <sfDir>, sort columns
by name, sort rows, and compare STRICTLY the way the driver's
pandas-sort+hash does:

- pandas DTYPES must match exactly (int64 vs float64 vs int32 vs
  object all hash differently even when values compare equal — this
  is what sank etl_mad_outliers/vocab_coverage in round 5: DuckDB
  sum(int) returns HUGEINT -> pandas float64, Spark rank() is int32);
- array/list cells are a hard FAIL (the driver's compare crashes on
  them — round 5 emb_standardize);
- floats must be bit-identical incl. the sign of zero (-0.0 vs 0.0
  compare == but hash differently); NaN==NaN is accepted.
"""
import duckdb, json, re, sys, glob, os, math
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def split_with(sql):
    """Parse a `WITH [RECURSIVE] a AS (...), b(c1, c2) AS (...)
    SELECT ...` into (recursive, [(name, cols, body)...], main_query)
    — `cols` is the optional column-alias list incl. parens, or '' —
    or None when the statement has no top-level WITH. Tracks paren
    depth and single-quoted strings, so CTE bodies may nest
    arbitrarily."""
    s = sql.strip()
    m = re.match(r'(?is)^WITH\s+(RECURSIVE\s+)?', s)
    if not m:
        return None
    recursive, i, n, ctes = bool(m.group(1)), m.end(), len(s), []
    skip = re.compile(r'(?:\s+|--[^\n]*)*')  # whitespace + -- comments
    while True:
        i += skip.match(s, i).end() - i
        m2 = re.match(r'(?is)([A-Za-z_][A-Za-z0-9_]*)\s*'
                      r'(\(\s*[A-Za-z_][A-Za-z0-9_]*'
                      r'(?:\s*,\s*[A-Za-z_][A-Za-z0-9_]*)*\s*\))?\s+AS\s+'
                      r'(?:MATERIALIZED\s+)?\(', s[i:])
        if not m2:
            return None
        name, cols = m2.group(1), m2.group(2) or ''
        k, depth, in_str = i + m2.end(), 1, False
        j = k
        while k < n and depth:
            c = s[k]
            if in_str:
                if c == "'":
                    if k + 1 < n and s[k + 1] == "'":
                        k += 1
                    else:
                        in_str = False
            elif c == '-' and k + 1 < n and s[k + 1] == '-':
                # `--` line comment: parens/quotes inside it are text
                while k < n and s[k] != '\n':
                    k += 1
            elif c == "'":
                in_str = True
            elif c == '(':
                depth += 1
            elif c == ')':
                depth -= 1
            k += 1
        ctes.append((name, cols, s[j:k - 1]))
        k += skip.match(s, k).end() - k
        m3 = re.match(r',', s[k:])
        if m3:
            i = k + m3.end()
        else:
            return recursive, ctes, s[k:]


def run_staged(con, sql):
    """Staged oracle mode: materialize each top-level CTE to a TEMP
    TABLE in order instead of one giant WITH — DuckDB then pays one
    pipeline at a time instead of holding the whole shared-chain graph
    of concurrent pipeline buffers resident, which is what pushed the
    sf10 ann_ivfpq / dedup_cascade mirrors past the ~75 GB spill
    budget. A SELF-REFERENTIAL CTE (under WITH RECURSIVE) stages as
    `CREATE TEMP TABLE x AS WITH RECURSIVE x AS (...) SELECT * FROM x`
    — its body reads the already-staged tables, and everything AFTER
    it keeps staging (the r11 fix: the previous prefix-only staging
    left every CTE after an early recursive fixpoint inside one giant
    WITH, exactly the compositions — the cascades — that need staging
    most). Results are byte-identical to the unstaged form — selfcheck
    runs the full sf0.01 suite in staged mode as the equivalence
    proof."""
    parsed = split_with(sql)
    if not parsed:
        return con.sql(sql).df()
    recursive, ctes, main = parsed
    # peak-footprint control: a staged table is DEAD once its last
    # consumer has materialized — drop it then, not at query end
    # (the tokenize/shingle heads feed only the next step or two; at
    # sf10 keeping them all alive is itself tens of GB of temp)
    last_ref = {}
    for idx, (name, _, _) in enumerate(ctes):
        pat = re.compile(rf'\b{name}\b')
        last_ref[name] = idx
        for later, (_, _, b2) in enumerate(ctes[idx + 1:], idx + 1):
            if pat.search(b2):
                last_ref[name] = later
        if pat.search(main):
            last_ref[name] = len(ctes)
    created = []
    try:
        for idx, (name, cols, body) in enumerate(ctes):
            if recursive and re.search(rf'\b{name}\b', body):
                con.sql(f'CREATE TEMP TABLE "{name}" AS '
                        f'WITH RECURSIVE {name}{cols} AS ({body}) '
                        f'SELECT * FROM {name}')
            elif cols:
                # column-alias CTE: stage through a nested WITH so the
                # alias list applies exactly as it would in-query
                con.sql(f'CREATE TEMP TABLE "{name}" AS '
                        f'WITH {name}{cols} AS ({body}) '
                        f'SELECT * FROM {name}')
            else:
                con.sql(f'CREATE TEMP TABLE "{name}" AS {body}')
            created.append(name)
            for dead in [c for c in created if last_ref[c] == idx and c != name]:
                con.sql(f'DROP TABLE IF EXISTS "{dead}"')
                created.remove(dead)
        return con.sql(main).df()
    finally:
        for name in reversed(created):
            con.sql(f'DROP TABLE IF EXISTS "{name}"')


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    bad_cols = [c for c in cols
                if df[c].map(lambda v: isinstance(v, (list, dict))
                             or hasattr(v, "tolist")).any()]
    if bad_cols:
        raise ValueError(f"non-scalar (array/struct) columns {bad_cols} — "
                         "driver compare cannot sort/hash these")
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return df


def cells_equal(a, b):
    try:
        both_na = bool(pd.isna(a)) and bool(pd.isna(b))
    except (TypeError, ValueError):
        both_na = False
    if both_na:
        return True
    if isinstance(a, float) and isinstance(b, float):
        # bit-identical: catches -0.0 vs 0.0 which == tolerates
        return math.copysign(1.0, a) == math.copysign(1.0, b) and a == b
    return a == b and type(a) is type(b) or (a == b and
        isinstance(a, (int, float)) == isinstance(b, (int, float)))


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # spill OUTSIDE the repo cwd (a big-sf oracle spilling tens of GB
    # of duckdb_temp_storage into the work tree stalls git) and keep
    # RSS bounded so the box stays usable next to a Spark JVM
    con.sql(f"SET temp_directory='/tmp/duckdb_spill_{os.getpid()}'")
    # 24GB default keeps the box usable next to a Spark JVM; big-sf
    # oracle reruns may need more (the single-process engine's working
    # set grows with the data — SELFCHECK_MEM='64GB' to raise it)
    con.sql(f"SET memory_limit='{os.environ.get('SELFCHECK_MEM', '24GB')}'")
    # capacity knobs for big-sf oracle runs (the compare sorts rows
    # itself, so insertion order is free to drop — it otherwise forces
    # DuckDB to keep ordered intermediates resident; fewer threads =
    # fewer concurrent pipeline buffers on the list-heavy ANN chains)
    con.sql("SET preserve_insertion_order=false")
    if os.environ.get("SELFCHECK_THREADS"):
        con.sql(f"SET threads={int(os.environ['SELFCHECK_THREADS'])}")
    for t in TABLES:
        path = f"{sfdir}/{t}.parquet"
        # multi-file table dirs (GenScale output) need the glob form;
        # ** also descends day-partition directories (gpart_* layouts)
        # WITHOUT hive_partitioning: the generated partition column is
        # pure layout and the source column stays in the data files,
        # so the view sees exactly the flat-layout schema
        glob_path = path + ("/**/*.parquet" if os.path.isdir(path) else "")
        con.sql(f"create view {t} as select * from '{glob_path}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    # optional 3rd arg: regex over query names (builder-side chunked /
    # resumable runs at big scale factors; the driver passes two args)
    if len(sys.argv) > 3:
        pat = re.compile(sys.argv[3])
        oracle = {k: v for k, v in oracle.items() if pat.search(k)}
    # SELFCHECK_STAGED: regex of query names whose oracle runs in the
    # staged (CTE → temp table) capacity mode; '.*' stages everything
    staged = (re.compile(os.environ["SELFCHECK_STAGED"])
              if os.environ.get("SELFCHECK_STAGED") else None)
    n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(con.sql(f"select * from read_parquet({files!r})").df())
            t0 = __import__("time").time()
            exp = canon(run_staged(con, oracle[name])
                        if staged and staged.search(name)
                        else con.sql(oracle[name]).df())
            osec = __import__("time").time() - t0
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols got={list(got.columns)} exp={list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows got={len(got)} exp={len(exp)}")
            n_fail += 1; continue
        # dtype parity: the driver hashes typed values, so int64 vs
        # float64 (or int32 vs int64) mismatches even when values ==
        dt_bad = [(c, str(got[c].dtype), str(exp[c].dtype))
                  for c in got.columns if str(got[c].dtype) != str(exp[c].dtype)]
        if dt_bad:
            print(f"FAIL {name}: dtypes differ {dt_bad}")
            n_fail += 1; continue
        bad = None
        for c in got.columns:
            g, e = got[c].tolist(), exp[c].tolist()
            for i, (a, b) in enumerate(zip(g, e)):
                if not cells_equal(a, b):
                    d = (abs(a - b) if isinstance(a, (int, float))
                         and isinstance(b, (int, float)) else None)
                    bad = (c, i, a, b, d); break
            if bad: break
        if bad:
            c, i, a, b, d = bad
            if c.endswith("_in_bound"):
                # the sketch-certification flag columns mirror literal
                # 1s on the oracle side — a mismatch here means the
                # Spark-side sketch estimate drifted outside its
                # documented bound on THIS dataset, not a hash bug;
                # name it so the failure mode is self-explaining
                print(f"FAIL {name}: SKETCH CERTIFICATION failure — "
                      f"flag col={c} row={i} got={a!r} (oracle pins 1: the "
                      f"approx estimate left its bound; inspect the raw "
                      f"estimate column next to {c} in {outdir}/{name})")
            else:
                print(f"FAIL {name}: col={c} row={i} got={a!r} exp={b!r} absdiff={d}")
            n_fail += 1
        else:
            print(f"OK   {name}: {len(got)} rows, {len(got.columns)} cols"
                  f" (oracle {osec:.1f}s)")
    rows_only = [] if len(sys.argv) > 3 else [
        f for f in sorted(os.listdir(outdir))
        if os.path.isdir(os.path.join(outdir, f)) and f not in oracle]
    for name in rows_only:
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        n = con.sql(f"select count(*) from read_parquet({files!r})").fetchone()[0] if files else 0
        print(f"ROWS {name}: {n} rows (no SQL oracle)")
    print(f"{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
