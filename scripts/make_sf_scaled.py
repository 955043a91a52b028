"""Materialize an N-times-scaled copy of a testdata directory (default
sf0.1 -> a synthetic "sf1") for the one-off scaling bench
(scripts/bench_scaling.py; VERDICT r7 item 4).

Scaling model = TPC-H's: fact and dimension tables (customer, supplier,
part, orders, lineitem, documents) all grow linearly with SF;
nation/region (and here events/embeddings, which no scaling-bench query
reads) stay fixed. Each of the N replicas is the original table with
every key column shifted by replica * offset (offsets are powers of ten
above the source max, so replica key spaces never collide and NULL keys
stay NULL), and cross-table key references shifted CONSISTENTLY
(lineitem.l_orderkey moves with orders.o_orderkey, etc.), so every join
resolves exactly as in the source and per-key densities — orders per
customer, lineitems per order, baskets per part — are preserved, which
is what makes the timing comparison a scaling measurement rather than a
skew experiment.

Text columns (documents.text, part.p_name) are re-lettered per replica
with a replica-unique deterministic permutation of the alphabet
(F.translate over [a-zA-Z], pure codegen; replica 0 is the identity):
replicas become content-DISJOINT while every per-replica property
(token lengths, window geometry, shingle structure, near-dup pair
structure) is preserved — an Nx corpus then carries Nx the near-dup
pairs, matching a real corpus with a constant duplicate rate, instead
of the quadratic cross-replica pair blowup that byte-identical
replication would fabricate. (A plain Caesar shift only offers 26
distinct maps, so factors above 26 would silently reintroduce
identical replicas; permutations are checked pairwise-distinct.)

Usage: python scripts/make_sf_scaled.py [factor] [src] [out]
Defaults: 10 /root/testdata/sf0.1 .bench_cache/sf1
"""

from __future__ import annotations

import os
import shutil
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from simplemapreduceframework_spark import get_spark
from simplemapreduceframework_spark.sources import load_table

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# key columns shifted per replica, grouped by the key space they share
KEY_SPACES: dict[str, list[tuple[str, str]]] = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "docid": [("documents", "doc_id")],
}
SCALED = ["customer", "supplier", "part", "orders", "lineitem", "documents"]
COPIED = ["region", "nation", "events", "embeddings"]
RELETTER_COLS = {"documents": ["text"], "part": ["p_name"]}

_ALPHA = string.ascii_lowercase + string.ascii_uppercase


def _perm(i: int) -> str:
    """Deterministic alphabet permutation for replica i (identity for
    i = 0): Fisher-Yates driven by an LCG seeded from i."""
    if i == 0:
        return string.ascii_lowercase
    letters = list(string.ascii_lowercase)
    s = (i * 2654435761) % (2**32) or 1
    for j in range(25, 0, -1):
        s = (s * 1664525 + 1013904223) % (2**32)
        k = s % (j + 1)
        letters[j], letters[k] = letters[k], letters[j]
    return "".join(letters)


def _reletter(col: str, i: int):
    p = _perm(i)
    if p == string.ascii_lowercase:
        return F.col(col)
    return F.translate(F.col(col), _ALPHA, p + p.upper())


def _replica(df: DataFrame, table: str, i: int, offsets: dict[str, int]) -> DataFrame:
    cols = []
    shift_cols = {
        c: offsets[space]
        for space, pairs in KEY_SPACES.items()
        for t, c in pairs
        if t == table
    }
    for c in df.columns:
        if c in shift_cols:
            cols.append((F.col(c) + F.lit(i * shift_cols[c])).alias(c))
        elif c in RELETTER_COLS.get(table, []):
            cols.append(_reletter(c, i).alias(c))
        else:
            cols.append(F.col(c))
    return df.select(*cols)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(REPO, ".bench_cache", "sf1")
    )
    perms = [_perm(i) for i in range(factor)]
    assert len(set(perms)) == factor, "replica permutations collide"
    os.makedirs(out, exist_ok=True)
    spark = get_spark("make-sf-scaled")

    # round each shared key space's offset up to a power of ten above
    # its max across every table referencing it
    offsets: dict[str, int] = {}
    for space, pairs in KEY_SPACES.items():
        mx = 0
        for t, c in pairs:
            v = load_table(spark, src, t).agg(F.max(c)).collect()[0][0]
            mx = max(mx, int(v or 0))
        off = 10
        while off <= mx:
            off *= 10
        offsets[space] = off
    print(f"[make_sf_scaled] key offsets: {offsets}", file=sys.stderr)

    for t in SCALED:
        df = load_table(spark, src, t)
        scaled = _replica(df, t, 0, offsets)
        for i in range(1, factor):
            scaled = scaled.unionByName(_replica(df, t, i, offsets))
        dst = f"{out}/{t}.parquet"
        scaled.write.mode("overwrite").parquet(dst)
        print(f"[make_sf_scaled] {t}: x{factor} -> {dst}", file=sys.stderr)
    for t in COPIED:
        s, d = f"{src}/{t}.parquet", f"{out}/{t}.parquet"
        if os.path.isdir(s):
            shutil.copytree(s, d, dirs_exist_ok=True)
        else:
            shutil.copyfile(s, d)
        print(f"[make_sf_scaled] {t}: copied", file=sys.stderr)
    print(out)


if __name__ == "__main__":
    main()
