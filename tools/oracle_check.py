#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: run its oracle SQL in DuckDB over the
same parquet tables, sort columns by name, sort rows, and compare values
exactly. Reports per-query row/schema/value match. Dev tool only — the real
gate is driver-side.
"""
import decimal
import glob
import json
import math
import os
import sys

import duckdb
import pyarrow as patypes
import pyarrow.parquet as pq


def type_class(t):
    """Coarse Arrow-type class mirroring the driver's type-sensitive hash.

    int/float/string width variants collapse (the driver tolerates those),
    but decimal is its OWN class: DuckDB's window sum(BIGINT) returns
    DECIMAL128 which the driver hashes differently from BIGINT — the local
    gate must flag that (q61, round 3) rather than let Decimal(123) == 123.
    """
    if patypes.types.is_integer(t):
        return "int"
    if patypes.types.is_floating(t):
        return "float"
    if patypes.types.is_decimal(t):
        return "decimal"
    if patypes.types.is_string(t) or patypes.types.is_large_string(t):
        return "str"
    if patypes.types.is_boolean(t):
        return "bool"
    if patypes.types.is_timestamp(t):
        return "timestamp"
    if patypes.types.is_date(t):
        return "date"
    if patypes.types.is_binary(t) or patypes.types.is_large_binary(t):
        return "binary"
    if (patypes.types.is_list(t) or patypes.types.is_large_list(t)
            or patypes.types.is_fixed_size_list(t)):
        return f"list<{type_class(t.value_type)}>"
    return str(t)


def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    import pyarrow as pa
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    return tbl


def norm_rows(tbl):
    cols_names = tbl.column_names
    cols_values = [c.to_pylist() for c in tbl.columns]
    order = sorted(range(len(cols_names)), key=lambda i: cols_names[i])
    names = [cols_names[i] for i in order]
    types = [type_class(tbl.schema.field(i).type) for i in order]
    rows = list(zip(*[cols_values[i] for i in order])) if cols_values else []

    def key(row):
        return tuple((x is None, repr(x)) for x in row)

    return names, types, sorted(rows, key=key)


def canon(v):
    if v is None:
        return None
    # Decimal must NOT compare equal to int/float (Python == says
    # Decimal(123) == 123; the driver's hash disagrees) — tag it.
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # collapse -0.0 vs 0.0
        if v == 0.0:
            return 0.0
        return v
    if isinstance(v, bool):
        return int(v)
    return v


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    # optional third arg: write the per-query verdicts in the driver's
    # CORRECTNESS_r{N}.json format (rows/schema/hash match + row counts)
    verdict_path = sys.argv[3] if len(sys.argv) > 3 else None
    verdicts = {}
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    def connect():
        """Fresh connection per query: a connection that has replayed many
        queries measurably degrades (the q34 forest replay ran 2-3× slower
        on a 70-query-old connection than on a fresh one — round 13), and
        the heavy oracles are exactly where that hurts."""
        c = duckdb.connect()
        for t in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sfdir}/{t}.parquet')")
        return c

    def error_marker(name):
        """Verify writes <out>/<name>/_ERROR when a query throws — surface
        it as a red row (r07: a thrown query silently vanished)."""
        p = os.path.join(outdir, name, "_ERROR")
        if os.path.exists(p):
            with open(p) as f:
                lines = f.read().strip().splitlines()
            return lines[1] if len(lines) > 1 else "(no message)"
        return None

    import time as _time
    n_pass = n_fail = 0
    t_total = 0.0
    for name in sorted(oracles):
        sql = oracles[name]
        err = error_marker(name)

        def verdict(rows=False, schema=False, hsh=False, sr=-1, orr=-1,
                    e=None):
            verdicts[name] = {
                "rows_match": rows, "schema_match": schema,
                "hash_match": hsh, "spark_rows": sr, "oracle_rows": orr,
                "err": e}

        if err is not None:
            print(f"FAIL {name}: query threw: {err}")
            verdict(e=err)
            n_fail += 1
            continue
        spark_tbl = load_spark(outdir, name)
        if spark_tbl is None:
            print(f"FAIL {name}: no spark output")
            verdict(e="no spark output")
            n_fail += 1
            continue
        try:
            con = connect()
            try:
                t0 = _time.time()
                ora = con.execute(sql).fetch_arrow_table()
                dt = _time.time() - t0
                t_total += dt
            finally:
                # close on the error path too — a run with many failing
                # oracles would otherwise accumulate leaked connections
                con.close()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            verdict(e=f"oracle sql error: {e}")
            n_fail += 1
            continue
        s_names, s_types, s_rows = norm_rows(spark_tbl)
        o_names, o_types, o_rows = norm_rows(ora)
        # the DRIVER canonicalizes rows with pandas sort_values, which dies
        # on list-typed cells (unhashable ndarray — q86, round 8). A local
        # pass with a list column would be a replica/driver divergence:
        # flag it here so the schema gets scalarized before the driver runs.
        listy = [n for n, t in zip(s_names, s_types) if t.startswith("list<")]
        if listy:
            print(f"FAIL {name}: list-typed column(s) {listy} would crash "
                  f"the driver's pandas sort — emit a scalar long form")
            n_fail += 1
            continue
        if s_names != o_names:
            print(f"FAIL {name}: schema {s_names} vs {o_names}")
            verdict(rows=len(s_rows) == len(o_rows), sr=len(s_rows),
                    orr=len(o_rows))
            n_fail += 1
            continue
        if s_types != o_types:
            print(f"FAIL {name}: types {list(zip(s_names, s_types))} "
                  f"vs {list(zip(o_names, o_types))}")
            verdict(rows=len(s_rows) == len(o_rows), sr=len(s_rows),
                    orr=len(o_rows))
            n_fail += 1
            continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rows {len(s_rows)} vs {len(o_rows)}")
            verdict(schema=True, sr=len(s_rows), orr=len(o_rows))
            n_fail += 1
            continue
        bad = None
        for i, (sr, orr) in enumerate(zip(s_rows, o_rows)):
            if tuple(map(canon, sr)) != tuple(map(canon, orr)):
                bad = (i, sr, orr)
                break
        if bad:
            print(f"FAIL {name}: first diff row {bad[0]}:")
            print(f"     spark : {bad[1]}")
            print(f"     oracle: {bad[2]}")
            verdict(rows=True, schema=True, sr=len(s_rows),
                    orr=len(o_rows))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows, {dt:.1f}s oracle)")
            verdict(rows=True, schema=True, hsh=True, sr=len(s_rows),
                    orr=len(o_rows))
            n_pass += 1

    # rows-only queries (no oracle): just report counts
    for d in sorted(glob.glob(os.path.join(outdir, "q*"))):
        name = os.path.basename(d)
        if name in oracles:
            continue
        err = error_marker(name)
        if err is not None:
            print(f"FAIL {name}: query threw: {err}")
            n_fail += 1
            continue
        tbl = load_spark(outdir, name)
        n = tbl.num_rows if tbl is not None else -1
        status = "ok" if n > 0 else "EMPTY"
        print(f"INFO {name}: rows-only, {n} rows [{status}]")

    if verdict_path:
        with open(verdict_path, "w") as f:
            json.dump(verdicts, f, indent=1)
        print(f"verdicts -> {verdict_path}")
    print(f"\n{n_pass} pass / {n_fail} fail "
          f"({t_total:.0f}s total DuckDB replay)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
