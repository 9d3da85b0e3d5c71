"""Generate a scale-validation slice: sf0.1 testdata replicated K×.

One-off input for ``tools/scale_bench.py`` (VERDICT r5 #5): takes the
driver's sf0.1 parquet and produces an sf1-equivalent directory by
key-offset sharding — each of the K copies is an independent,
join-consistent shard of the same distribution:

- fact/dim keys (orderkey, custkey, partkey, suppkey, event_id,
  user_id, doc_id, vec_id) are offset by ``copy * (max_key + 1)`` so
  every copy's joins resolve within the copy and group counts scale
  linearly (the shape real data growth has);
- ``nation``/``region`` stay fixed (TPC-H dims that do not scale);
- ``documents.text`` is Caesar-rotated per copy (a-z shifted by the
  copy index) so shingle/MinHash/SimHash content is DISTINCT across
  copies: duplicate-group sizes and the near-dup rate stay constant
  while corpus size grows — otherwise every doc would gain K-1
  artificial near-twins and pair output would scale K², measuring the
  construction instead of the engine;
- ``embeddings.embedding`` gets a deterministic per-copy jitter on
  dim 0 (copy * 1e-3) to break exact ties without moving vectors
  between LSH/IVF buckets in any meaningful way;
- ``events.ts`` is left alone: K× density in the same time window is
  the realistic stress for windowed aggregation state.

Output is NOT test input for correctness (the driver's testdata is
read-only and authoritative); it exists only so the bench can measure
wall-clock scaling exponents. Written to ``_scaledata/sf1`` (gitignored).

For K > 26 the Caesar rotation alone COLLIDES (copy i and i+26 share
identical text, manufacturing cross-copy duplicate lines/grams that
would make dedup output super-linear by construction), so pass
``--line-tag`` to additionally suffix every text LINE with a
copy-unique token: within-copy duplicate lines stay duplicates,
cross-copy lines can never collide at any K. Used by the 100×
documents-only slice (``--tables documents``) that validates the
linear-exponent ops (bloom_decontamination, c4_line_dedup,
dsir_importance_weights — VERDICT r7 next-round #6); the 10× full
slice keeps the r5-r7 transform so exponents stay comparable across
rounds.

Usage: python tools/gen_scale_slice.py [K] [src_dir] [dst_dir]
           [--tables t1,t2] [--line-tag]
"""

from __future__ import annotations

import os
import sys

import duckdb

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()


def _caesar_expr(col: str, shift_expr: str) -> str:
    """DuckDB expression rotating [a-zA-Z] of ``col`` by a per-row shift."""
    return (
        f"translate({col}, '{LOWER}{UPPER}', "
        f"substr('{LOWER}{LOWER}', ({shift_expr}) % 26 + 1, 26) || "
        f"substr('{UPPER}{UPPER}', ({shift_expr}) % 26 + 1, 26))"
    )


def _doc_text_expr(line_tag: bool) -> str:
    """Per-copy text transform. Caesar keeps the r5-r7 10x methodology;
    --line-tag adds a copy-unique suffix per LINE so no two copies can
    share a line or a gram window at ANY K (the K>26 collision fix)."""
    caesar = _caesar_expr("text", "i")
    if not line_tag:
        return caesar
    return (
        f"array_to_string(list_transform(string_split({caesar}, chr(10)),"
        f" l -> l || ' c' || i), chr(10))"
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    only_tables = None
    line_tag = "--line-tag" in flags
    for f in flags:
        if f.startswith("--tables"):
            only_tables = set(f.split("=", 1)[1].split(","))
    sys.argv = [sys.argv[0]] + args
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(repo, "_scaledata", "sf1")
    )
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def maxkey(table: str, col: str) -> int:
        return con.execute(
            f"SELECT max({col}) FROM read_parquet('{src}/{table}.parquet')"
        ).fetchone()[0]

    omax = maxkey("orders", "o_orderkey") + 1
    cmax = maxkey("customer", "c_custkey") + 1
    pmax = maxkey("part", "p_partkey") + 1
    smax = maxkey("supplier", "s_suppkey") + 1
    emax = maxkey("events", "event_id") + 1
    umax = maxkey("events", "user_id") + 1
    dmax = maxkey("documents", "doc_id") + 1
    vmax = maxkey("embeddings", "vec_id") + 1

    # SELECT templates; {i} is the copy index column from range(K)
    shard = {
        "customer": f"""
            c_custkey + i * {cmax} AS c_custkey, c_name, c_nationkey,
            c_acctbal, c_mktsegment""",
        "supplier": f"""
            s_suppkey + i * {smax} AS s_suppkey, s_name, s_nationkey,
            s_acctbal""",
        "part": f"""
            p_partkey + i * {pmax} AS p_partkey, p_name, p_brand, p_type,
            p_size, p_retailprice""",
        "orders": f"""
            o_orderkey + i * {omax} AS o_orderkey,
            o_custkey + i * {cmax} AS o_custkey,
            o_orderstatus, o_totalprice, o_orderdate, o_orderpriority""",
        "lineitem": f"""
            l_orderkey + i * {omax} AS l_orderkey,
            l_partkey + i * {pmax} AS l_partkey,
            l_suppkey + i * {smax} AS l_suppkey,
            l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
            l_returnflag, l_linestatus, l_shipdate""",
        "events": f"""
            event_id + i * {emax} AS event_id, ts,
            user_id + i * {umax} AS user_id,
            event_type, value, props""",
        "documents": f"""
            doc_id + i * {dmax} AS doc_id,
            {_doc_text_expr(line_tag)} AS text,
            lang, source, n_chars""",
        "embeddings": f"""
            vec_id + i * {vmax} AS vec_id,
            ([embedding[1] + i * 0.001::FLOAT] || embedding[2:])::FLOAT[]
                AS embedding,
            label""",
    }

    for table, sel in shard.items():
        if only_tables is not None and table not in only_tables:
            continue
        out = os.path.join(dst, f"{table}.parquet")
        con.execute(
            f"COPY (SELECT {sel} "
            f"FROM read_parquet('{src}/{table}.parquet'), "
            f"range({k}) AS r(i) ORDER BY i) "
            f"TO '{out}' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}')"
        ).fetchone()[0]
        print(f"{table}: {n} rows -> {out}")

    for table in ("nation", "region"):
        if only_tables is not None and table not in only_tables:
            continue
        out = os.path.join(dst, f"{table}.parquet")
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')) "
            f"TO '{out}' (FORMAT PARQUET)"
        )
        print(f"{table}: copied (fixed dim)")


if __name__ == "__main__":
    main()
