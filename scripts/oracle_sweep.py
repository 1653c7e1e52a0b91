"""Full-registry correctness sweep vs the DuckDB oracle — committed artifact.

The driver samples only the first 50 registry entries into
CORRECTNESS_r{N}.json; this script runs EVERY ``queries()`` entry through the
same rows/schema/hash comparison at the driver's gate scale (sf0.01) and
writes ``CORRECTNESS_LOCAL.json`` in the identical per-query format, so the
repo carries committed evidence for the whole registry (VERDICT.md round-4
punch-list item 4 / ADVICE.md round-4 finding 4).

Usage:  python scripts/oracle_sweep.py  [--sf-dir /root/testdata/sf0.01]

Comparison contract (mirrors the driver and tests/test_oracle_parity.py):
  * columns sorted by lowercase name before value comparison;
  * rows sorted by (is-None, str) canonical key;
  * EXACT equality including floats — the queries are engineered
    bit-deterministic across engines;
  * hash = sha256 over the canonicalized value matrix (match booleans are
    the contract; the digest itself is just a compact witness).
"""

from __future__ import annotations

import argparse
import hashlib
import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = [tuple(r[i] for i in idx) for r in rows]
    return sorted(mat, key=lambda t: tuple((x is None, str(x)) for x in t))


def value_hash(mat):
    h = hashlib.sha256()
    for row in mat:
        h.update(repr(row).encode())
        h.update(b"\x00")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=os.path.join(REPO, "CORRECTNESS_LOCAL.json"))
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args()

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # the engine's session factory, NOT a bare builder: the evidence
    # artifact must be produced under the same pinned conventions
    # (AQE/skew flags, Arrow, parquet reader pins) the driver and bench
    # run with, or a config-dependent regression could pass here and
    # break there
    sys.path.insert(0, REPO)
    from one_one_one_rule_spark.session import get_spark

    # (console progress bars are a static conf — they go to stderr, which
    # callers redirect; don't try to set it on a live session)
    spark = get_spark(
        "oracle_sweep", master=args.master, shuffle_partitions=8
    )

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    qs, osql = mod.queries(), mod.oracle_sql()
    report, n_pass, n_rows_only, n_fail = {}, 0, 0, 0
    t0 = time.time()
    for name, fn in qs.items():
        entry = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            sdf = fn(spark, args.sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
            entry["spark_rows"] = len(srows)
            if name not in osql:
                # weaker rows-only gate: a query with no oracle must at
                # least produce rows — zero rows is recorded as a FAILURE
                # so the committed artifact can never carry vacuous
                # evidence for a broken oracle-less query
                entry["rows_match"] = len(srows) > 0
                n_rows_only += 1
                n_fail += not entry["rows_match"]
                status = "rows-only" if entry["rows_match"] else "FAIL"
            else:
                res = con.sql(osql[name])
                dcols = [c.lower() for c in res.columns]
                drows = res.fetchall()
                entry["oracle_rows"] = len(drows)
                entry["rows_match"] = len(srows) == len(drows)
                entry["schema_match"] = sorted(scols) == sorted(dcols)
                smat, dmat = canon(srows, scols), canon(drows, dcols)
                entry["hash_match"] = (
                    entry["schema_match"] and value_hash(smat) == value_hash(dmat)
                )
                ok = entry["rows_match"] and entry["schema_match"] and entry["hash_match"]
                n_pass += ok
                n_fail += not ok
                status = "PASS" if ok else "FAIL"
        except Exception as e:  # noqa: BLE001 — sweep must finish and report
            entry["err"] = f"{type(e).__name__}: {e}"[:500]
            n_fail += 1
            status = "ERROR"
        report[name] = entry
        print(f"{status:9s} {name} ({entry['spark_rows']} rows)", flush=True)

    summary = {
        "total": len(qs), "hash_gated_pass": n_pass, "rows_only": n_rows_only,
        "fail": n_fail, "sf_dir": args.sf_dir,
        "elapsed_sec": round(time.time() - t0, 1),
    }
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "queries": report}, f, indent=1)
    print(json.dumps(summary))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
