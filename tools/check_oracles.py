"""Local replica of the driver's oracle gate: run each __spark_entry__
queries()[name] at a given sf dir and compare against oracle_sql()[name]
via DuckDB — row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")


def _norm(v):
    try:
        import numpy as np

        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            v = float(v)
        if isinstance(v, np.bool_):
            return bool(v)
        if isinstance(v, np.ndarray):
            return tuple(_norm(x) for x in v)
    except ImportError:
        pass
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except ImportError:
        pass
    return v


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--json"]
    write_json = "--json" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict[str, dict] = {}

    import duckdb

    import __spark_entry__ as entrymod
    from osm2world_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="oracle-check")
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            try:
                df = fn(spark, sf_dir)
                n = df.count()
                print(f"[rows-only] {name}: {n} rows, cols={df.columns}")
                results[name] = {"mode": "rows_only", "ok": True, "rows": n}
            except Exception as e:
                print(f"[rows-only] {name}: FAILED — {e}")
                failures.append(name)
                results[name] = {"mode": "rows_only", "ok": False, "err": str(e)[:200]}
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sorted(sdf.columns)
            s_pdf = sdf.toPandas()
            s_rows = [
                tuple(_norm(v) for v in row)
                for row in s_pdf[s_cols].itertuples(index=False, name=None)
            ]
            # Go through pandas on the DuckDB side too — the driver compares
            # via dataframes, where e.g. HUGEINT (sum of BIGINT) lands as
            # float64, not Python int. fetchall() would hide that.
            o_pdf = con.sql(oracles[name]).df()
            o_cols = sorted(o_pdf.columns)
            o_rows = [
                tuple(_norm(v) for v in row)
                for row in o_pdf[o_cols].itertuples(index=False, name=None)
            ]
            ok_schema = s_cols == o_cols
            ok_count = len(s_rows) == len(o_rows)
            ok_values = sorted(map(repr, s_rows)) == sorted(map(repr, o_rows))
            # int-vs-float column kind mismatches hash-diverge in the driver
            kind_warn = []
            if ok_schema:
                for c in s_cols:
                    sk = s_pdf[c].dtype.kind
                    ok = o_pdf[c].dtype.kind
                    if {sk, ok} == {"i", "f"} or {sk, ok} == {"u", "f"}:
                        kind_warn.append(f"{c}: spark={s_pdf[c].dtype} duck={o_pdf[c].dtype}")
            status = "OK" if (ok_schema and ok_count and ok_values and not kind_warn) else "MISMATCH"
            print(f"[oracle] {name}: {status} spark={len(s_rows)} duck={len(o_rows)} cols_ok={ok_schema}")
            results[name] = {
                "mode": "oracle", "ok": status == "OK",
                "rows_match": ok_count, "schema_match": ok_schema,
                "values_match": ok_values, "spark_rows": len(s_rows),
                "oracle_rows": len(o_rows),
            }
            if kind_warn:
                print(f"    dtype-kind mismatch (int vs float): {kind_warn}")
            if status != "OK":
                failures.append(name)
                if not ok_schema:
                    print(f"    spark cols: {s_cols}\n    duck cols:  {o_cols}")
                if ok_schema:
                    s_set = set(map(repr, s_rows))
                    o_set = set(map(repr, o_rows))
                    print(f"    spark-only: {sorted(s_set - o_set)[:3]}")
                    print(f"    duck-only:  {sorted(o_set - s_set)[:3]}")
        except Exception as e:
            print(f"[oracle] {name}: ERROR — {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            results[name] = {"mode": "oracle", "ok": False, "err": str(e)[:200]}

    if write_json:
        import json

        out = {
            "note": "self-reported LOCAL oracle gate over ALL registered queries "
                    "(the driver's CORRECTNESS gate covers the first 50); "
                    "same compare semantics, run by tools/check_oracles.py",
            "sf_dir": sf_dir,
            "n_queries": len(results),
            "n_ok": sum(1 for r in results.values() if r["ok"]),
            "results": results,
        }
        with open("/root/repo/ORACLE_LOCAL.json", "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print("wrote ORACLE_LOCAL.json")

    print()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("ALL ORACLE CHECKS PASSED")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
