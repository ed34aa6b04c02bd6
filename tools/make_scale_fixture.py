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

Skew mode (r07 VERDICT item 4 — the scaling curve varies VOLUME but
keeps key distributions uniform; 100-TB joins die on zipfian keys):
``--skew S`` post-processes the built fixture so the big-join foreign
keys follow a bounded zipf(s=S) law while referential integrity holds
exactly — every remapped key is drawn from the referenced table's REAL
key set via inverse-CDF rank lookup (u from a hash of the row's stable
identity, rank = ((u·(N^(1-s)−1))+1)^(1/(1-s)) clamped to [1, N]):

- lineitem.l_orderkey → zipf over orders' keys (q01/q90's one big-big
  shuffle lands ~hottest-order share of the fact table on one reducer);
- orders.o_custkey   → zipf over customer keys;
- events.user_id     → zipf over the event user domain;
- documents: every 3rd doc gets one shared appended sentence — a
  hot-shingle injection (df ≈ N/3) that attacks the q25/q66 shingle
  equi-join; the df-ordered prefix filter is the designed mitigation.

Usage:
    python tools/make_scale_fixture.py /root/testdata/sf0.1 .scale/sf0.3 3
    python tools/make_scale_fixture.py /root/testdata/sf0.1 .scale/sf1 10
    python tools/make_scale_fixture.py /root/testdata/sf0.1 .scale/sf0.3-skew 3 --skew 1.2

Pure DuckDB, no Spark; deterministic (no RNG anywhere — the zipf draw
hashes stable row identities).
"""

from __future__ import annotations

import os
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


HOT_SENTENCE = (
    "breaking market update the index moved sharply on heavy volume "
    "as traders rotated into defensive sectors before the close"
)


def _zipf_rank(u_expr: str, n_expr: str, s: float) -> str:
    """Bounded-zipf inverse CDF: P(rank ≤ r) = (r^(1-s)−1)/(N^(1-s)−1),
    so rank = ceil((u·(N^(1-s)−1)+1)^(1/(1-s))), clamped into [1, N].
    All-SQL, deterministic given ``u_expr``."""
    e = 1.0 - s
    raw = f"CAST(CEIL(POWER({u_expr} * (POWER({n_expr}, {e}) - 1.0) + 1.0, {1.0 / e})) AS BIGINT)"
    return f"LEAST({n_expr}, GREATEST(1, {raw}))"


def _hash_u(ident_expr: str) -> str:
    """Deterministic uniform-ish u ∈ [0,1) from a row identity."""
    return f"((hash({ident_expr}) % 1000003) / 1000003.0)"


def skew(out: str, s: float) -> None:
    """Rewrite the built fixture's join-key distributions in place (see
    module docstring). Each rewrite reads {out}/T.parquet, swaps ONE
    column via a zipf rank lookup against the referenced table's ranked
    key list, and atomically replaces the file — schemas, row counts,
    and every other column are byte-identical."""
    con = duckdb.connect()
    outp = Path(out)

    def rewrite(table: str, select_sql: str) -> None:
        tmp = outp / f"{table}.parquet.tmp"
        con.execute(f"COPY ({select_sql}) TO '{tmp}' (FORMAT PARQUET)")
        os.replace(tmp, outp / f"{table}.parquet")
        top = con.execute(
            f"SELECT col, n FROM (SELECT {KEYCHECK[table]} AS col, COUNT(*) AS n "
            f"FROM read_parquet('{outp}/{table}.parquet') GROUP BY 1 ORDER BY 2 DESC LIMIT 3)"
        ).fetchall()
        total = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{outp}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: skewed; top keys {[(k, n, f'{n / total:.1%}') for k, n in top]}")

    KEYCHECK = {"lineitem": "l_orderkey", "orders": "o_custkey", "events": "user_id"}

    def fk_rewrite(
        table: str, fk_col: str, ref_table: str, ref_key: str, ident: str
    ) -> None:
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{outp}/{table}.parquet')"
            ).fetchall()
        ]
        proj = ", ".join(
            "keys.k AS " + c if c == fk_col else "src." + c for c in cols
        )
        # N inlined as a literal so the zipf rank folds to per-row math
        # and the key lookup stays a plain equi-join on rn
        n = con.execute(
            f"SELECT COUNT(DISTINCT {ref_key}) FROM read_parquet('{outp}/{ref_table}.parquet')"
        ).fetchone()[0]
        rank = _zipf_rank(_hash_u(ident), str(n), s)
        rewrite(
            table,
            f"""
            WITH keys AS (
                SELECT k, ROW_NUMBER() OVER (ORDER BY k) AS rn FROM (
                    SELECT DISTINCT {ref_key} AS k
                    FROM read_parquet('{outp}/{ref_table}.parquet'))
            )
            SELECT {proj}
            FROM read_parquet('{outp}/{table}.parquet') src
            JOIN keys ON keys.rn = {rank}
            """,
        )

    fk_rewrite(
        "lineitem",
        "l_orderkey",
        "orders",
        "o_orderkey",
        "CAST(src.l_orderkey AS VARCHAR) || ':' || CAST(src.l_linenumber AS VARCHAR)",
    )
    fk_rewrite("orders", "o_custkey", "customer", "c_custkey", "src.o_orderkey")
    fk_rewrite("events", "user_id", "events", "user_id", "src.event_id")

    # hot-shingle injection: one shared sentence appended to every 3rd doc
    tmp = outp / "documents.parquet.tmp"
    con.execute(
        f"""
        COPY (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN text || ' {HOT_SENTENCE}' ELSE text END AS text,
                   lang, source,
                   CASE WHEN doc_id % 3 = 0 THEN length(text || ' {HOT_SENTENCE}') ELSE n_chars END AS n_chars
            FROM read_parquet('{outp}/documents.parquet')
        ) TO '{tmp}' (FORMAT PARQUET)
        """
    )
    os.replace(tmp, outp / "documents.parquet")
    print(f"documents: hot sentence appended to every 3rd doc")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else ".scale/sf0.3"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    build(src, out, copies)
    if "--skew" in sys.argv:
        skew(out, float(sys.argv[sys.argv.index("--skew") + 1]))
