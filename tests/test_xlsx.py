"""A5 binary path: the pure-stdlib xlsx parser (zipfile + xml.etree)
that replaces the openpyxl-gated read. The writer here emits a
spec-valid workbook (content types, rels, shared strings incl.
rich-text runs, inline strings, sparse rows with A1 refs) so the
round trip exercises the real binary format — the q185/q301 pattern
applied to the reference's holdings ingest (sector.py:155)."""

from __future__ import annotations

import zipfile

from stock_data_pipeline_spark import io as sio

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="holdings" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def write_xlsx(path, rows):
    """rows: list of dicts {col_index: value} (sparse) or lists.
    Strings go through sharedStrings except ones prefixed 'inline:',
    which are written as inlineStr cells. The FIRST shared string is
    written as two rich-text runs to exercise run concatenation."""
    shared: list[str] = []
    sheet_rows = []
    for rn, row in enumerate(rows, start=1):
        items = row.items() if isinstance(row, dict) else enumerate(row)
        cells = []
        for ci, v in items:
            ref = f"{_col_letter(ci)}{rn}"
            if v is None:
                continue
            if isinstance(v, str) and v.startswith("inline:"):
                s = v[len("inline:"):]
                cells.append(f'<c r="{ref}" t="inlineStr"><is><t>{s}</t></is></c>')
            elif isinstance(v, str):
                if v not in shared:
                    shared.append(v)
                cells.append(f'<c r="{ref}" t="s"><v>{shared.index(v)}</v></c>')
            elif isinstance(v, bool):
                cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
            else:
                cells.append(f'<c r="{ref}"><v>{v}</v></c>')
        sheet_rows.append(f'<row r="{rn}">{"".join(cells)}</row>')
    sis = []
    for i, s in enumerate(shared):
        if i == 0 and len(s) > 1:  # rich-text runs split
            sis.append(f"<si><r><t>{s[:1]}</t></r><r><t>{s[1:]}</t></r></si>")
        else:
            sis.append(f"<si><t>{s}</t></si>")
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(sis)
        + "</sst>"
    )
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>" + "".join(sheet_rows) + "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CT)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)


HOLDINGS_ROWS = [
    ["Fund Name:", "inline:Materials Select Sector SPDR Fund"],
    ["Ticker Symbol:", "XLB"],
    ["Holdings:", 7.0],
    ["As of:", "28-Jun-2024"],
    ["Ticker", "Weight", "Shares Held"],
    ["LIN", 18.5, 1000.5],
    ["SHW", 7.25, 2000.0],
    ["BRK.B", 5.0, 123.0],
    ["-", None, None],              # placeholder row -> dropped
    ["F6T", 1.0, 5.0],              # contains '6'   -> dropped
    {0: "APD", 2: 777.0},           # sparse: weight cell missing entirely
]


def test_parse_xlsx_rows_types_and_sparsity(tmp_path):
    p = str(tmp_path / "h.xlsx")
    write_xlsx(p, HOLDINGS_ROWS)
    rows = sio.parse_xlsx_rows(p)
    assert rows[0][0] == "Fund Name:"
    assert rows[0][1] == "Materials Select Sector SPDR Fund"  # inlineStr
    assert rows[2][1] == 7.0                                   # numeric
    assert rows[4] == ["Ticker", "Weight", "Shares Held"]
    assert rows[5] == ["LIN", 18.5, 1000.5]
    assert rows[8][0] == "-" and rows[8][1] is None            # blank cells
    assert rows[10] == ["APD", None, 777.0]                    # sparse row
    # rich-text first shared string concatenated correctly
    assert "Fund Name:" in [r[0] for r in rows]


def test_read_excel_edge_to_clean_holdings(spark, tmp_path):
    """The full reference pipeline over REAL xlsx bytes: binary parse →
    skiprows=4 → header normalization → clean_holdings drops/normalizes
    — row-for-row what sector.py:155-168 computes."""
    p = str(tmp_path / "h.xlsx")
    write_xlsx(p, HOLDINGS_ROWS)
    df = sio.read_excel_edge(spark, p, skiprows=4)
    assert df.columns == ["ticker", "weight", "shares_held"]
    out = {
        r["ticker"]: (r["weight"], r["shares_held"])
        for r in sio.clean_holdings(df, "2024-06-28").collect()
    }
    assert out == {
        "lin": (0.185, 1000.5),
        "shw": (0.0725, 2000.0),
        "brk_b": (0.05, 123.0),
        "apd": (None, 777.0),
    }


def test_xlsx_and_csv_edges_agree(spark, tmp_path):
    """The xlsx binary path and the CSV fallback must produce the same
    cleaned holdings for the same logical workbook."""
    px = str(tmp_path / "h.xlsx")
    write_xlsx(px, HOLDINGS_ROWS)
    pc = tmp_path / "h.csv"
    lines = []
    for row in HOLDINGS_ROWS:
        cells = row if isinstance(row, list) else [row.get(i) for i in range(3)]
        lines.append(",".join(
            "" if c is None else str(c).removeprefix("inline:").replace(",", " ")
            for c in cells
        ))
    pc.write_text("\n".join(lines) + "\n")
    a = sio.clean_holdings(sio.read_excel_edge(spark, px, 4), "2024-06-28")
    b = sio.clean_holdings(sio.read_holdings_csv_edge(spark, str(pc), 4), "2024-06-28")
    ka = sorted(map(tuple, a.collect()))
    kb = sorted(map(tuple, b.collect()))
    assert ka == kb


def test_xlsx_parse_roundtrips_arbitrary_tables():
    """Property: parse_xlsx_rows inverts the writer for ANY table of
    strings/floats/bools/None (sparse or dense), preserving cell
    placement and types."""
    from hypothesis import given, settings, strategies as st

    cell = st.one_of(
        st.none(),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.booleans(),
        st.text(
            alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")),
            min_size=1,
            max_size=8,
        ),
    )
    tables = st.lists(st.lists(cell, min_size=1, max_size=6), min_size=1, max_size=8)

    @given(rows=tables)
    @settings(max_examples=40, deadline=None)
    def check(rows):
        import tempfile
        from pathlib import Path

        with tempfile.TemporaryDirectory() as d:
            p = str(Path(d) / "t.xlsx")
            write_xlsx(p, rows)
            got = sio.parse_xlsx_rows(p)
        ncols = max(len(r) for r in rows)
        want = [list(r) + [None] * (ncols - len(r)) for r in rows]
        # trailing all-None columns are indistinguishable from absent
        # cells in the format itself — compare on the written width
        gotw = [r + [None] * (ncols - len(r)) for r in (row[:ncols] for row in got)]
        for w_row, g_row in zip(want, gotw):
            for w, g in zip(w_row, g_row):
                if isinstance(w, float):
                    assert g == float(w)
                else:
                    assert g == w
        assert len(gotw) == len(want)

    check()


def test_xlsx_omitted_rows_and_unreffed_cells_keep_spec_positions(tmp_path):
    """Excel omits entirely-empty rows from the XML and may omit cell
    refs; both must land at their SPEC positions — row r attributes
    anchor absolute row indices (no upward shift), and an unreffed cell
    follows the previous cell's column, not the cell count."""
    import zipfile

    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        '<row r="1"><c r="A1"><v>1</v></c></row>'
        # row 2 entirely absent from the XML
        '<row r="3"><c r="C3"><v>3</v></c><c><v>4</v></c></row>'
        "</sheetData></worksheet>"
    )
    p = str(tmp_path / "sparse.xlsx")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("[Content_Types].xml", _CT)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    rows = sio.parse_xlsx_rows(p)
    assert len(rows) == 3
    assert rows[0] == [1.0, None, None, None]
    assert rows[1] == [None, None, None, None]      # omitted row preserved
    assert rows[2] == [None, None, 3.0, 4.0]        # unreffed cell -> col D


def test_read_excel_edge_all_none_columns_and_header_only(spark, tmp_path):
    """Preamble wider than the data table (all-None padded columns) and
    header-only sheets must return DataFrames, not type-inference
    crashes."""
    wide_preamble = [
        ["a", "b", "c", "x", "y"],   # 5-wide preamble row
        ["Ticker", "Weight", "Shares Held"],
        ["LIN", 1.0, 2.0],
    ]
    p1 = str(tmp_path / "wide.xlsx")
    write_xlsx(p1, wide_preamble)
    df = sio.read_excel_edge(spark, p1, skiprows=1)
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["ticker"] == "LIN"
    assert rows[0]["col_3"] is None and rows[0]["col_4"] is None

    p2 = str(tmp_path / "headeronly.xlsx")
    write_xlsx(p2, [["junk"], ["Ticker", "Weight"]])
    empty = sio.read_excel_edge(spark, p2, skiprows=1)
    assert empty.count() == 0
    assert empty.columns == ["ticker", "weight"]
