"""Round-5 batch-37 additions: dedup threshold sweep (q360),
generation-loop detector (q361), PII density audit (q362), next-fit
compaction planner (q363). Each already hash-matches its DuckDB
oracle; these tests pin SEMANTICS against independent pure-Python
replays (literal set-Jaccard over shingle sets, string slicing for the
period check, a sequential NFD loop), so an engine-symmetric bug
cannot hide behind the oracle — q363's oracle bug (DuckDB struct-
accumulator list_reduce returning wrong values on multi-group input)
was caught exactly this way."""

from __future__ import annotations

import math
import re

import duckdb

from stock_data_pipeline_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _rows(sql: str):
    con = duckdb.connect()
    return con.execute(sql).fetchall()


def _close(a: float, b: float) -> bool:
    return math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-15)


def _docs():
    return _rows(
        f"""SELECT doc_id, source, text, n_chars
        FROM read_parquet('{SF}/documents.parquet')"""
    )


# ---------------------------------------------------------------- q360


def test_dedup_threshold_sweep_matches_python_replay(spark):
    docs = _docs()
    sh = {}
    for doc_id, _, text, _ in docs:
        tk = [t for t in re.split(r"\s+", text) if t]
        sh[doc_id] = {
            " ".join(tk[i : i + 3]) for i in range(max(len(tk) - 2, 0))
        }
    chars = {d: n for d, _, _, n in docs}
    ids = sorted(sh)
    pairs = []
    for i, a in enumerate(ids):
        if not sh[a]:
            continue
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter:
                pairs.append((a, b, inter, len(sh[a] | sh[b])))
    n_docs = len(docs)
    total_chars = sum(chars.values())
    got = {r.threshold_pct: r for r in
           REGISTRY["q360_dedup_threshold_sweep"].fn(spark, SF).collect()}
    assert sorted(got) == list(range(50, 100, 5))
    for theta in range(50, 100, 5):
        qual = [(a, b) for a, b, i, u in pairs if 100 * i >= theta * u]
        removed = {b for _, b in qual}
        row = got[theta]
        assert row.n_pairs == len(qual)
        assert row.docs_removed == len(removed)
        assert row.chars_removed == sum(chars[d] for d in removed)
        assert _close(row.doc_removal_rate, len(removed) / n_docs)
        assert _close(
            row.char_removal_rate, sum(chars[d] for d in removed) / total_chars
        )
    # the curve is monotone: higher threshold never removes more
    rates = [got[t].docs_removed for t in range(50, 100, 5)]
    assert all(a >= b for a, b in zip(rates, rates[1:]))


# ---------------------------------------------------------------- q361


def test_loop_detector_matches_python_replay(spark):
    docs = _docs()
    expected = {}
    for doc_id, source, text, _ in docs:
        tl = text[-64:]
        period = 0
        for p in range(1, 9):
            if len(tl) > p and tl[: len(tl) - p] == tl[p:]:
                period = p
                break
        expected[doc_id] = (source, len(tl), period)
    got = REGISTRY["q361_loop_detector"].fn(spark, SF).collect()
    assert len(got) == len(expected)
    for row in got:
        source, tail_len, period = expected[row.doc_id]
        assert (row.source, row.tail_len, row.loop_period) == (
            source, tail_len, period,
        )
        assert row.is_looping == (period != 0 and tail_len >= 32)
    # synthetic injected check: a literal 'ababab...' tail has period 2
    aba = "ab" * 40
    p = 0
    for q in range(1, 9):
        if aba[: len(aba) - q] == aba[q:]:
            p = q
            break
    assert p == 2


# ---------------------------------------------------------------- q362


def test_pii_density_matches_python_replay(spark):
    docs = _docs()
    email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+")
    ssn = re.compile(r"[0-9][0-9][0-9]-[0-9][0-9]-[0-9][0-9][0-9][0-9]")
    phone = re.compile(r"[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]")
    st: dict[str, list[int]] = {}
    for _, source, text, n_chars in docs:
        e = len(email.findall(text))
        s = len(ssn.findall(text))
        ph = len(phone.findall(text))
        c = st.setdefault(source, [0, 0, 0, 0, 0, 0])
        c[0] += 1
        c[1] += e
        c[2] += s
        c[3] += ph
        c[4] += (e + s + ph) > 0
        c[5] += n_chars
    got = REGISTRY["q362_pii_density"].fn(spark, SF).collect()
    assert len(got) == len(st)
    for row in got:
        n, e, s, ph, w, ch = st[row.source]
        assert (row.n_docs, row.emails, row.ssns, row.phones) == (n, e, s, ph)
        assert row.docs_with_pii == w
        assert _close(row.pii_per_100k_chars, (e + s + ph) * 1e5 / ch)


# ---------------------------------------------------------------- q363


def test_compaction_nextfit_matches_python_replay(spark):
    docs = _docs()
    by_src: dict[str, list] = {}
    for doc_id, source, _, n_chars in docs:
        by_src.setdefault(source, []).append((-n_chars, doc_id, n_chars))
    expected = {}
    nbins = {}
    for source, lst in by_src.items():
        lst.sort()
        b, fill = 0, 8192
        for _, doc_id, sz in lst:
            if fill + sz > 8192:
                b, fill = b + 1, sz
            else:
                fill += sz
            expected[doc_id] = (source, sz, b, fill)
        nbins[source] = b
    got = REGISTRY["q363_compaction_nextfit"].fn(spark, SF).collect()
    assert len(got) == len(expected)
    for row in got:
        source, sz, b, fill = expected[row.doc_id]
        assert (row.source, row.size_chars) == (source, sz)
        assert (row.bin_id, row.bin_fill_after) == (b, fill)
        assert row.n_bins == nbins[source]
        # capacity invariant: a bin's running fill only exceeds the cap
        # when a single oversized item owns the bin
        assert row.bin_fill_after <= 8192 or row.size_chars > 8192
