#!/usr/bin/env python3
"""Local mimic of the driver's t2 gate: run each oracle SQL in DuckDB over
the sf parquet tables and compare with the Verify parquet dumps.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark_result(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    return pq.read_table(files[0])


def norm_cell(v):
    import datetime
    if isinstance(v, float):
        return v
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return v


def table_rows(t):
    cols = sorted(t.column_names)
    data = {c: t.column(c).to_pylist() for c in cols}
    return cols, [tuple(norm_cell(data[c][i]) for c in cols)
                  for i in range(t.num_rows)]


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for tname in TABLES:
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{sfdir}/{tname}.parquet')")
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    twins = {}
    twins_path = os.path.join(outdir, "rows_only_twins.json")
    if os.path.exists(twins_path):
        with open(twins_path) as f:
            twins = json.load(f)

    declared = [d for d in sorted(os.listdir(outdir))
                if os.path.isdir(os.path.join(outdir, d))]
    n_pass = n_fail = 0
    for name in declared:
        got = load_spark_result(outdir, name)
        if name not in oracles:
            twin = f" twin={twins[name]}" if name in twins else ""
            print(f"[rows-only] {name}: rows={got.num_rows if got else 'MISSING'}{twin}")
            continue
        try:
            want = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if got is None:
            print(f"[FAIL] {name}: spark result missing")
            n_fail += 1
            continue
        # driver-comparator parity: the real gate loads both parquets into
        # pandas and lexsorts every column — list/struct/map cells are
        # unhashable numpy arrays there and crash it (CORRECTNESS_r05
        # x32c err). Emulate that as a hard FAIL instead of silently
        # tuple-izing like norm_cell used to.
        nested = [f"{side}:{f.name}" for side, t2 in (("spark", got), ("oracle", want))
                  for f in t2.schema if pa.types.is_nested(f.type)]
        if nested:
            print(f"[FAIL] {name}: nested column(s) {nested} — "
                  f"the driver's pandas comparator crashes on these; "
                  f"serialize with array_join/to_json in BOTH engines")
            n_fail += 1
            continue
        # driver-comparator parity: the real gate is dtype-sensitive —
        # DuckDB window sums over BIGINT come back HUGEINT (decimal128)
        # and hash-mismatch Spark's BIGINT even when values are equal
        # (CORRECTNESS_r14 x169/x173). Decimal on either side is a hard
        # FAIL here; never coerce it to float.
        decs = [f"{side}:{f.name}({f.type})"
                for side, t2 in (("spark", got), ("oracle", want))
                for f in t2.schema if pa.types.is_decimal(f.type)]
        if decs:
            print(f"[FAIL] {name}: decimal column(s) {decs} — "
                  f"CAST the deriving expression to BIGINT/DOUBLE in the "
                  f"oracle (window sums return HUGEINT in DuckDB)")
            n_fail += 1
            continue
        gcols, grows = table_rows(got)
        wcols, wrows = table_rows(want)
        if gcols != wcols:
            print(f"[FAIL] {name}: columns {gcols} != {wcols}")
            n_fail += 1
            continue
        if len(grows) != len(wrows):
            print(f"[FAIL] {name}: rows {len(grows)} != {len(wrows)}")
            n_fail += 1
            continue
        bad = 0
        maxerr = 0.0
        first_bad = None
        for i, (g, w) in enumerate(zip(grows, wrows)):
            if g != w:
                # measure float-only mismatch magnitude
                for a, b in zip(g, w):
                    if isinstance(a, float) and isinstance(b, float) and a != b:
                        maxerr = max(maxerr, abs(a - b))
                bad += 1
                if first_bad is None:
                    first_bad = (i, g, w)
        if bad:
            print(f"[FAIL] {name}: {bad}/{len(grows)} mismatched rows, "
                  f"max float err {maxerr:g}; first: {first_bad}")
            n_fail += 1
        else:
            print(f"[PASS] {name}: {len(grows)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(declared) - n_pass - n_fail} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
