"""Deterministic scale-up fixtures for the empirical scaling curve
(r06 VERDICT item 5).

/root/testdata is read-only and ships no generator, so larger scales
are built by REPLICATING sf0.1 k times with per-copy key remapping —
a construction chosen so every operator's work profile scales the way a
real corpus would:

- fact/dim tables: every key column is offset by ``copy *
  (max_key + 1)`` with FOREIGN KEYS remapped consistently, so join
  fan-outs, group cardinalities, and selectivities are preserved
  per-copy and total size scales exactly k×. Offsets stay < ~10^7 —
  far inside the portable-hash int64 domain bound (SCALE.md §11).
- documents: copy 0 is verbatim; copies k>0 suffix every whitespace
  token with ``~k``. Within-copy shingle/near-dup structure is
  EXACTLY the original's; across copies no shingle collides — so
  candidate-pair and cluster counts scale k× (linear corpus growth),
  not k²× (which naive text cloning would cause: every clone is a
  100%-Jaccard dup of its original). n_chars is recomputed to stay
  consistent with the rewritten text.
- embeddings: copies rotate the vector dimensions by k (norms and
  pairwise within-copy geometry preserved; cross-copy vectors land in
  different LSH/IVF cells, like fresh data). vec_id offsets keep the
  fixed query set (vec_id < 5) constant while the corpus grows — the
  ANN scaling shape of interest.

Usage:
    python tools/make_scale_fixture.py /root/testdata/sf0.1 .scale/sf0.3 3
    python tools/make_scale_fixture.py /root/testdata/sf0.1 .scale/sf1 10

Pure DuckDB, no Spark; deterministic (no RNG anywhere).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

VERBATIM = ["region", "nation"]
# table -> {key column -> stride table}: key cols offset by
# copy * (max(stride-table's key) + 1); a column keyed by ANOTHER
# table (foreign key) uses that table's stride so joins stay aligned.
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events:user_id"},
    "embeddings": {"vec_id": "embeddings"},
}
KEY_OF = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "events:user_id": "user_id",
    "embeddings": "vec_id",
    "documents": "doc_id",
}


def build(src: str, out: str, copies: int) -> None:
    outp = Path(out)
    outp.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    strides: dict[str, int] = {}
    for ref, keycol in KEY_OF.items():
        table = ref.split(":")[0]
        strides[ref] = (
            con.execute(
                f"SELECT max({keycol}) + 1 FROM read_parquet('{src}/{table}.parquet')"
            ).fetchone()[0]
        )

    def emit(table: str, select_for_copy) -> None:
        union = "\nUNION ALL\n".join(select_for_copy(k) for k in range(copies))
        con.execute(f"COPY ({union}) TO '{outp}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{outp}/{table}.parquet')").fetchone()[0]
        print(f"{table}: {n} rows")

    for t in VERBATIM:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{outp}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: verbatim")

    for t, keymap in KEYED.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]

        def sel(k: int, t=t, keymap=keymap, cols=cols) -> str:
            exprs = []
            for c in cols:
                if c in keymap:
                    exprs.append(f"{c} + {k * strides[keymap[c]]} AS {c}")
                elif t == "embeddings" and c == "embedding":
                    # rotate dims by k (list is 1-based; k=0 → verbatim)
                    exprs.append(
                        f"(embedding[{k % 64 + 1}:] || embedding[:{k % 64}]) AS embedding"
                        if k % 64
                        else "embedding"
                    )
                else:
                    exprs.append(c)
            return f"SELECT {', '.join(exprs)} FROM read_parquet('{src}/{t}.parquet')"

        emit(t, sel)

    def doc_sel(k: int) -> str:
        if k == 0:
            return f"SELECT * FROM read_parquet('{src}/documents.parquet')"
        toks = (
            f"list_transform(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''),"
            f" x -> x || '~{k}')"
        )
        text = f"list_aggregate({toks}, 'string_agg', ' ')"
        return (
            f"SELECT doc_id + {k * strides['documents']} AS doc_id, "
            f"{text} AS text, lang, source, "
            f"length({text}) AS n_chars "
            f"FROM read_parquet('{src}/documents.parquet')"
        )

    emit("documents", doc_sel)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else ".scale/sf0.3"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    build(src, out, copies)
