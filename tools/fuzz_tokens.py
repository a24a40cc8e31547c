#!/usr/bin/env python3
"""Cross-engine tokenizer-contract fuzzer.

Generates strings stacked with the Unicode hazards that made the
round-5 vocab_coverage divergence possible (engine-dependent
lowercasing, whitespace-class mismatches) plus the ones the synthetic
corpus still never exercises (astral emoji, combining marks, NEL /
NBSP / LS / PS, vertical tab, lone-ish separators), dumps both
engines' view of every tokenizer-contract primitive (graft.tools.
FuzzTokens ↔ the DuckDB mirrors it emits), and compares cell-by-cell
with the strict selfcheck discipline (dtype parity, bit-identical
values).

Usage: python3 tools/fuzz_tokens.py [n_docs] [seed]
Exit 0 = contract holds on every generated string.
"""
import json, os, random, subprocess, sys, tempfile

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

ATOMS = [
    # plain ASCII words and digits
    "hello", "WORLD", "Spark", "DuckDB", "12345", "a", "Z",
    # whitespace zoo: contract class [ \t\n\x0B\f\r] ...
    " ", "\t", "\n", "\x0b", "\f", "\r", "  ", "\r\n",
    # ... and the non-class whitespace that must NOT split tokens
    "\x85",        # NEL — in Java \s? no; in RE2 \s? no; must pass through
    " ",      # NBSP
    " ", " ",  # line/paragraph separators
    "​",      # zero-width space
    # case-mapping hazards (ASCII-translate must leave these alone)
    "ΣΑΣ", "σς", "İstanbul", "ıı", "ß", "ẞ", "ǅungla",
    # combining marks and normalization bait
    "é", "é", "äb", "ñ",
    # astral plane (UTF-16 surrogate pairs in Java)
    "\U0001F600", "\U0001F1E6\U0001F1F6", "\U00010348",
    # mixed-script and punctuation
    "foo.bar", "x,y;z", "quote\"back\\slash", "tab\tinside",
    "CamelCase", "ALLCAPS", "mIxEd",
]


def gen(n_docs, seed):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        k = rng.randint(0, 12)
        rows.append((i, "".join(rng.choice(ATOMS) for _ in range(k))))
    # pinned regression rows, independent of the seed
    rows.append((n_docs + 0, ""))
    rows.append((n_docs + 1, "\x0b"))                  # VT-only doc
    rows.append((n_docs + 2, "ΣΟΦΟΣ ΣΟΦΟΣ\x0bΣΟΦΟΣ"))  # final-sigma + VT
    rows.append((n_docs + 3, "İİİ ııı"))
    rows.append((n_docs + 4, "\U0001F600 éé"))
    return rows


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    return df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    work = tempfile.mkdtemp(prefix="graft_fuzz_")
    rows = gen(n_docs, seed)
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }), os.path.join(work, "fuzz.parquet"))

    out = os.path.join(work, "out")
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.tools.FuzzTokens {work} {out}"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-3000:]); print(r.stderr[-3000:])
        sys.exit(f"FuzzTokens dump failed ({r.returncode})")

    con = duckdb.connect()
    con.sql(f"create view fuzz as select * from '{work}/fuzz.parquet'")
    oracle = json.load(open(os.path.join(out, "fuzz_oracle.json")))
    failures = 0
    for name, sql in oracle.items():
        import glob as _g
        sp = canon(pd.concat([pd.read_parquet(f) for f in
                              _g.glob(f"{out}/{name}.parquet/*.parquet")]))
        du = canon(con.sql(sql).df())
        ok = True
        if list(sp.columns) != list(du.columns):
            ok = False; print(f"FAIL {name}: columns {list(sp.columns)} vs {list(du.columns)}")
        elif len(sp) != len(du):
            ok = False; print(f"FAIL {name}: rows {len(sp)} vs {len(du)}")
        elif [str(t) for t in sp.dtypes] != [str(t) for t in du.dtypes]:
            ok = False; print(f"FAIL {name}: dtypes {list(sp.dtypes)} vs {list(du.dtypes)}")
        else:
            neq = (sp != du) & ~(sp.isna() & du.isna())
            if neq.any().any():
                ok = False
                idx = neq.any(axis=1)
                bad = pd.concat([sp[idx].head(5).add_suffix("_spark"),
                                 du[idx].head(5).add_suffix("_duck")], axis=1)
                print(f"FAIL {name}: {int(idx.sum())} differing rows\n{bad}")
        if ok:
            print(f"OK   {name}: {len(sp)} rows")
        else:
            failures += 1
    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    sys.exit(0 if failures == 0 else 1)


if __name__ == "__main__":
    main()
