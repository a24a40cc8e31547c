#!/usr/bin/env python3
"""Patch subset-scoped same-boot gate fields into an sf10 bench line.

At sf10 the one-shot 238-query DuckDB oracle does not fit the box, so
the gate denominator comes from the strict STAGED selfcheck's
per-query oracle seconds (printed on its OK lines). The ratio is then
computed over the INTERSECTION of the bench inventory and the
selfcheck subset — both sides scoped to the same queries — and the
artifact records that scope explicitly (oracle_subset_n,
engine_subset_total) so it is self-contained for the 2x gate.

Usage: sf10_gate_fields.py BENCH_JSON SELFCHECK_LOG OUT_JSON
"""
import json
import re
import sys


def main():
    bench_path, log_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    bench = json.load(open(bench_path))
    oracle = {}
    for line in open(log_path):
        m = re.match(r"OK\s+(\S+): .*\(oracle ([0-9.]+)s\)", line)
        if m:
            oracle[m.group(1)] = float(m.group(2))
    # one mapping for BOTH the intersection and the subtotal — binding
    # them separately let a 'queries'-less bench file compute `shared`
    # from 'delta' but an empty subtotal, silently emitting ratio 0.0
    qsec = bench.get("queries") or bench.get("delta")
    if not qsec:
        sys.exit(f"{bench_path}: no 'queries' (or 'delta') map — refusing "
                 "to emit a vacuous gate artifact")
    shared = sorted(set(oracle) & set(qsec))
    engine_subtotal = sum(qsec.get(q, 0.0) for q in shared)
    oracle_subtotal = sum(oracle[q] for q in shared)
    bench["oracle_total"] = round(oracle_subtotal, 1)
    bench["oracle_subset_n"] = len(shared)
    bench["engine_subset_total"] = round(engine_subtotal, 1)
    bench["ratio"] = (round(engine_subtotal / oracle_subtotal, 2)
                      if oracle_subtotal > 0 else None)
    bench["oracle_source"] = "staged strict selfcheck (per-query oracle seconds)"
    with open(out_path, "w") as f:
        json.dump(bench, f)
    print(f"subset n={len(shared)} engine={engine_subtotal:.1f}s "
          f"oracle={oracle_subtotal:.1f}s ratio={bench['ratio']}")


if __name__ == "__main__":
    main()
