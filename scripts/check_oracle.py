"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, column names, and
order-insensitive values. Usage::

    python scripts/check_oracle.py [sf_dir] [query ...]
    python scripts/check_oracle.py --record [sf_dir] [query ...]

``--record`` (ADVICE r12): after the run, every GREEN oracle-compared
query gets an entry in ``scripts/local_verified.json`` binding its
CURRENT v2 hash (scripts/check_window.py's module-aware hash) to this
verification. check_window.py accepts that evidence for changed
queries beyond the driver window — so a module edit whose hash-flip
blast radius exceeds the 50-slot window is re-verified VISIBLY instead
of silently re-baselined. Evidence self-invalidates: any further
change to the query flips its v2 hash and the stale entry no longer
counts.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(dv.dtype, np.floating):
            sv = sv.astype(float)
            dv = dv.astype(float)
            both_nan = np.isnan(sv) & np.isnan(dv)
            eq = (sv == dv) | both_nan
        else:
            eq = sv == dv
        if not np.all(eq):
            bad = int(np.count_nonzero(~eq))
            idx = int(np.argmax(~eq))
            problems.append(
                f"col {c}: {bad} mismatches, first at row {idx}: "
                f"spark={sv[idx]!r} duck={dv[idx]!r}"
            )
        # dtype drift worth knowing about even when values match
        if sv.dtype.kind != dv.dtype.kind:
            problems.append(f"col {c}: dtype spark={sv.dtype} duck={dv.dtype}")
    return problems


def main() -> int:
    record = "--record" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod
    from dataflow_flex_pyarrow_to_gds_spark import get_spark

    spark = get_spark(app_name="check-oracle", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duck_connect(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failed = []
    green = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle (rows-only check) — {len(spark_pdf)} rows")
            continue
        try:
            duck_pdf = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failed.append(name)
            print(f"FAIL {name}:")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"OK   {name}: {len(spark_pdf)} rows")
            green.append(name)
    print(f"\n{len(failed)} failures" if failed else "\nall green")
    if record and green:
        import json

        import check_window as cw

        evid_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "local_verified.json",
        )
        cur = cw.current_hashes()
        evid = {}
        if os.path.exists(evid_path):
            with open(evid_path) as f:
                evid = json.load(f)
        rnd = os.environ.get("SPARK_GRAFT_ROUND", "local")
        for name in green:
            evid[name] = {
                "hash": cur[name],
                "sf_dir": sf_dir,
                "recorded": rnd,
            }
        with open(evid_path, "w") as f:
            json.dump(evid, f, indent=1, sort_keys=True)
        print(f"recorded {len(green)} green entries to {evid_path}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
