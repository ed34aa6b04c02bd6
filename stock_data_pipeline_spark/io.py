"""Sources and sinks — SURVEY.md §2 rows A (scans) and B (sinks).

The reference round-trips state through PostgreSQL tables and S3 CSVs
(functions.py:76-89, s3_connection.py:41-53). Here every source returns
a DataFrame and every sink takes one; paths may be local, `s3a://`, or
anything Hadoop FS supports — same API, no download hop. Edge-world
ingestion (HTTP scrape, xlsx, yfinance) stays outside the engine and
enters through ``createDataFrame`` adapters, exactly as SURVEY §7
prescribes.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# A8/X4 — the scraped shares-outstanding cell, e.g. "60.92 M"
# (reference: sector.py:197-201)
SHARES_OUTSTANDING_PATTERN = r"([\d,.]+)\s*([MB])"


def read_csv_table(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    """A4 — CSV state reload (the reference's S3 CSV → pandas hop,
    functions.py:76-89, without the local download). Pass an explicit
    schema in production — inferSchema is a full extra pass."""
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_jsonl_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    keep_corrupt: bool = True,
) -> DataFrame:
    """JSONL scan — the standard interchange format for LLM training
    corpora (one JSON document per line). An EXPLICIT schema is
    required: schema inference is a full extra pass over what may be
    100 TB of text, and inferred types drift between snapshots.

    Corrupt-record policy is explicit, not implicit: with
    ``keep_corrupt`` (default) malformed lines land in a
    ``_corrupt_record`` column (PERMISSIVE) so a pipeline can count,
    quarantine, and audit them — silently dropping data is how corpus
    bugs hide; pass ``keep_corrupt=False`` for DROPMALFORMED when the
    caller has already audited the source. DROPMALFORMED caveat (pinned
    in tests/test_io_and_asof.py): malformedness is judged against the
    columns a query actually reads, so ``count()`` (column-pruned) and
    a full read can disagree on row count for type-mismatched records —
    another reason PERMISSIVE is the default here.

    Scale notes: uncompressed/``zstd``-framed JSONL is splittable, so
    the scan parallelizes per HDFS block; gzip is NOT splittable (one
    task per file) — shard gzipped corpora into many files.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if keep_corrupt and not any(f.name == "_corrupt_record" for f in schema.fields):
        schema = schema.add("_corrupt_record", T.StringType())
    reader = spark.read.schema(schema).option(
        "mode", "PERMISSIVE" if keep_corrupt else "DROPMALFORMED"
    )
    if keep_corrupt:
        reader = reader.option("columnNameOfCorruptRecord", "_corrupt_record")
    return reader.json(path)


def write_jsonl_table(df: DataFrame, path: str, compression: str | None = None) -> None:
    """JSONL sink — the export half of the corpus interchange
    round trip. Keeps the DataFrame's partitioning (one file per
    partition: the shardable layout downstream trainers expect);
    ``compression='gzip'|'zstd'`` etc. passes through to the writer."""
    writer = df.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_config_list(spark: SparkSession, path: str, col_name: str = "value") -> DataFrame:
    """A10 — line-per-entry config scan (config/spdr_sectors.txt,
    sectors.py:62-70)."""
    return spark.read.text(path).select(
        F.lower(F.trim(F.col("value"))).alias(col_name)
    ).filter(F.col(col_name) != "")


def read_jdbc_table(
    spark: SparkSession, url: str, table: str, properties: dict[str, str] | None = None
) -> DataFrame:
    """A6 — whole-table JDBC scan (pd.read_sql at functions.py:97-99).
    Needs the driver jar on the classpath; partition with
    partitionColumn/lowerBound/upperBound options for big tables so the
    read parallelizes instead of funneling through one connection."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


PRICES_EDGE_SCHEMA = (
    "date date, ticker string, open double, high double, low double, "
    "close double, volume long"
)


def fetch_ohlcv_history(
    spark: SparkSession,
    tickers: list[str],
    start: str | None = None,
    end: str | None = None,
    fetcher=None,
) -> DataFrame:
    """A1–A3 — the yfinance ingest edge (get_stock_data_single/multiple,
    load_yfinance_data.py:122-135) as an engine adapter: fetch per
    ticker at the driver edge, normalize (drop Dividends/Stock Splits,
    strip tz+time — load_yfinance_data.py:59,74-80), land as ONE long
    DataFrame (the reference's axis=1 concat becomes a union — SURVEY
    §2 A2/J2).

    ``fetcher(ticker, start, end) -> pandas.DataFrame`` is injected; the
    default tries yfinance and raises ``NotImplementedError`` when the
    library is absent (this container). Everything engine-side is real:
    schema, normalization, union, incremental composition with
    ``operators.incremental.append_incremental``.
    """
    if fetcher is None:
        def fetcher(ticker, start, end):  # pragma: no cover - env-dependent
            try:
                import yfinance as yf
            except ImportError as exc:
                raise NotImplementedError(
                    "yfinance not available; inject a fetcher(ticker, start, end)"
                ) from exc
            return yf.Ticker(ticker).history(start=start, end=end, interval="1d")

    import pandas as pd

    frames = []
    for ticker in tickers:
        pdf = fetcher(ticker, start, end)
        if pdf is None or len(pdf) == 0:
            continue
        pdf = pdf.reset_index()
        pdf.columns = [str(c).lower().replace(" ", "_") for c in pdf.columns]
        pdf = pdf.rename(columns={"index": "date"})
        pdf["date"] = pd.to_datetime(pdf["date"]).dt.tz_localize(None).dt.date
        pdf["ticker"] = ticker.replace(".", "_").lower()  # X1 normalization
        keep = ["date", "ticker", "open", "high", "low", "close", "volume"]
        frames.append(pdf[[c for c in keep if c in pdf.columns]])
    if not frames:
        return spark.createDataFrame([], PRICES_EDGE_SCHEMA)
    out = pd.concat(frames, ignore_index=True)
    return spark.createDataFrame(out, schema=PRICES_EDGE_SCHEMA)


_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _xlsx_col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'AB7' -> 27: the column part of an A1-style ref."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def parse_xlsx_rows(path: str, sheet_index: int = 0) -> list[list]:
    """Pure-stdlib xlsx parse (zipfile + xml.etree — an .xlsx IS a zip
    of XML parts): returns the chosen worksheet as a dense list of rows
    (None for blank/missing cells, honoring A1 cell refs so sparse rows
    land in the right columns). Supports the cell types the holdings
    workbook uses: numbers (float), shared strings (incl. rich-text
    runs), inline strings, booleans, and formula cells via their cached
    value. Closes the reference's binary xlsx path
    (sector.py:155 pd.read_excel) without openpyxl."""
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(path) as zf:
        # workbook sheet order -> relationship id -> worksheet part
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rel_ns = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
        sheets = wb.find(f"{_XLSX_NS}sheets")
        rid = list(sheets)[sheet_index].attrib[f"{rel_ns}id"]
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        target = next(
            r.attrib["Target"]
            for r in rels
            if r.attrib["Id"] == rid
        ).lstrip("/")
        if not target.startswith("xl/"):
            target = "xl/" + target

        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in sst.findall(f"{_XLSX_NS}si"):
                # plain <t> or rich-text <r><t> runs, concatenated
                shared.append("".join(t.text or "" for t in si.iter(f"{_XLSX_NS}t")))

        ws = ET.fromstring(zf.read(target))
        # rows/cells are placed by their SPEC positions: a <row r="N">
        # lands at sheet row N (writers omit entirely-empty rows — a
        # positional append would silently shift everything below them,
        # breaking skiprows/header alignment), and an unreffed cell
        # goes one column after the previous cell in its row
        rows_by_idx: dict[int, list] = {}
        next_row = 0
        for row_el in ws.iter(f"{_XLSX_NS}row"):
            r_attr = row_el.attrib.get("r")
            row_idx = int(r_attr) - 1 if r_attr else next_row
            next_row = row_idx + 1
            cells: dict[int, object] = {}
            last_col = -1
            for c in row_el.findall(f"{_XLSX_NS}c"):
                ref = c.attrib.get("r", "")
                col = _xlsx_col_index(ref) if ref else last_col + 1
                last_col = col
                ctype = c.attrib.get("t", "n")
                if ctype == "inlineStr":
                    is_el = c.find(f"{_XLSX_NS}is")
                    val: object = (
                        "".join(t.text or "" for t in is_el.iter(f"{_XLSX_NS}t"))
                        if is_el is not None
                        else None
                    )
                else:
                    v = c.find(f"{_XLSX_NS}v")
                    raw = v.text if v is not None else None
                    if raw is None:
                        val = None
                    elif ctype == "s":
                        # a workbook can carry s-type cells with a
                        # missing/short sharedStrings part — fail with
                        # the file and cell named, not an IndexError
                        sidx = int(raw)
                        if not 0 <= sidx < len(shared):
                            raise ValueError(
                                f"xlsx parse: {path} cell "
                                f"{ref or f'row {row_idx + 1}'} references "
                                f"shared string {sidx} but the workbook "
                                f"has {len(shared)}"
                            )
                        val = shared[sidx]
                    elif ctype == "b":
                        val = bool(int(raw))
                    elif ctype == "str":  # formula cached string
                        val = raw
                    else:  # 'n' numeric (incl. formula cached number)
                        val = float(raw)
                cells[col] = val
            rows_by_idx[row_idx] = cells
    nrows = max(rows_by_idx, default=-1) + 1
    ncols = max((max(c) + 1 for c in rows_by_idx.values() if c), default=0)
    return [
        [rows_by_idx.get(r, {}).get(i) for i in range(ncols)]
        for r in range(nrows)
    ]


def read_excel_edge(spark: SparkSession, path: str, skiprows: int = 4) -> DataFrame:
    """A5 — holdings workbook scan (pd.read_excel(skiprows=4),
    sector.py:155). Spark has no core xlsx source; this is a driver-edge
    read returning a DataFrame. The binary parse is the pure-stdlib
    :func:`parse_xlsx_rows` (no openpyxl needed); ``skiprows`` rows of
    preamble are dropped, the next row is the header (lowercased,
    spaces -> underscores, like the pandas path). The whole path is
    dependency-free: rows go to ``createDataFrame`` as plain tuples
    with an explicit per-column schema (uniform float/bool/str columns
    keep their type; mixed or all-None columns become string), so
    heterogeneous sheets can never fail Spark type inference."""
    rows = parse_xlsx_rows(path)[skiprows:]
    if not rows:
        return spark.createDataFrame([], "ticker string")
    header = [
        str(c).lower().replace(" ", "_") if c is not None else f"col_{i}"
        for i, c in enumerate(rows[0])
    ]
    data = rows[1:]
    # parse_xlsx_rows returns uniform-width rows (dense grid, padded to
    # the sheet's ncols) — assert it rather than silently truncating a
    # wider row in the zip below, the failure the pandas path raised on
    for r in data:
        if len(r) != len(header):
            raise ValueError(
                f"xlsx parse: {path} produced a {len(r)}-cell row under a "
                f"{len(header)}-column header — non-rectangular sheet grid"
            )
    col_sql_types = []
    for i in range(len(header)):
        kinds = {type(r[i]) for r in data if r[i] is not None}
        col_sql_types.append(
            "double" if kinds == {float}
            else "boolean" if kinds == {bool}
            else "string"
        )
    schema = ", ".join(f"`{c}` {t}" for c, t in zip(header, col_sql_types))
    tuples = [
        tuple(
            v if v is None or t != "string" or isinstance(v, str) else str(v)
            for v, t in zip(r, col_sql_types)
        )
        for r in data
    ]
    return spark.createDataFrame(tuples, schema)


def read_holdings_csv_edge(spark: SparkSession, path: str, skiprows: int = 4) -> DataFrame:
    """A5 fallback — the holdings workbook pre-extracted to CSV, read
    with the same ``skiprows=4`` semantics as the xlsx scan
    (sector.py:155). pandas is always present, so unlike
    :func:`read_excel_edge` this path runs in this sandbox; both funnel
    into :func:`clean_holdings` for the engine-side pipeline."""
    import pandas as pd

    pdf = pd.read_csv(path, skiprows=skiprows)
    pdf.columns = [str(c).lower().replace(" ", "_") for c in pdf.columns]
    return spark.createDataFrame(pdf)


def clean_holdings(df: DataFrame, as_of_date: str) -> DataFrame:
    """A5 engine half — the workbook-cleaning pipeline of
    ``create_sector_shares_dataframe`` (sector.py:155-168), Spark-first:

    - project (ticker, weight, shares_held)
    - drop placeholder rows: ``ticker != '-'``, ticker NOT NULL
    - drop tickers containing ``'6'`` (the reference's futures-contract
      exclusion)
    - normalize ticker for SQL (``BRK.B`` → ``brk_b``, X1)
    - ``weight / 100`` (percent → fraction)
    - stamp the as-of date

    Returns the LONG layout (date, ticker, weight, shares_held) — the
    scale-correct shape; the reference's terminal one-row-per-date
    pivot is the presentation step (pipeline/presentation.py), and
    membership evolution over long holdings is D3 (etl.py, q158).
    """
    from stock_data_pipeline_spark.functions.scalars import make_ticker_sql_compatible

    t = F.col("ticker")
    return (
        df.select("ticker", "weight", "shares_held")
        .filter((t != "-") & t.isNotNull() & ~t.contains("6"))
        .select(
            F.lit(as_of_date).alias("date"),
            make_ticker_sql_compatible(t).alias("ticker"),
            (F.col("weight").cast("double") / F.lit(100.0)).alias("weight"),
            F.col("shares_held").cast("double").alias("shares_held"),
        )
    )


def parse_shares_outstanding_html(spark: SparkSession, html_rows: list[tuple[str, str]]) -> DataFrame:
    """A8 — the parse half of the ssga.com scrape (sector.py:187-207):
    given (sector, html_cell_text) pairs from the edge fetch, extract the
    magnitude string with the same regex the reference uses. The HTTP
    GET itself stays outside the engine."""
    df = spark.createDataFrame(html_rows, "sector string, cell string")
    return df.select(
        "sector",
        F.regexp_extract("cell", SHARES_OUTSTANDING_PATTERN, 1).alias("amount"),
        F.regexp_extract("cell", SHARES_OUTSTANDING_PATTERN, 2).alias("magnitude"),
    )


def write_parquet_table(
    df: DataFrame, path: str, mode: str = "append", partition_by: list[str] | None = None
) -> None:
    """B1/B5 — the engine-native sink (the reference's to_sql append +
    feather cache collapse into one). Date-partitioning is what makes
    the incremental-load filter (F1) prune at scale."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_orc_table(
    df: DataFrame, path: str, mode: str = "append", partition_by: list[str] | None = None
) -> None:
    """B5 companion — ORC sink (Spark-native, zero extra deps): the
    other columnar interchange format warehouses commonly mandate
    (Hive/Trino estates). Same partitioning semantics as the parquet
    sink; predicate pushdown and column pruning work identically."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc_table(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """A7 companion — ORC scan; pass ``schema`` (DDL string) to keep
    plan construction footer-probe-free like the parquet catalog path."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def overwrite_partitions(df: DataFrame, path: str, partition_by: list[str]) -> None:
    """B2 at scale — dynamic partition overwrite: replace ONLY the
    partitions present in ``df``, leaving every other partition of the
    table untouched. This is the idempotent daily-load sink (re-running
    a day's job rewrites that day's partitions, never truncates the
    table the way static overwrite mode would). The per-write option
    scopes the behavior to this write — no session-level conf leak."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def compact_parquet_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite ``src_path`` into
    ``ceil(total_bytes / target_file_bytes)`` output files (per
    partition directory when ``partition_by`` is given, via
    ``maxRecordsPerFile``-free explicit repartition).

    Streaming sinks and incremental appends accumulate files far below
    the HDFS/S3 sweet spot; scan parallelism then pays per-file open
    cost and the NameNode/listing pays per-file metadata. Sizes come
    from the Hadoop FileSystem of the source path (works for s3a/hdfs,
    not just local), listed driver-side — metadata only, no Spark job.
    Writes to ``dst_path`` (atomic swap is the caller's move — engines
    shouldn't guess rename semantics on object stores). Returns the
    target file count.
    """
    import math

    df = spark.read.parquet(src_path)
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = jpath.getFileSystem(hconf)
    it = fs.listFiles(jpath, True)
    total = 0
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            total += f.getLen()
    n_files = max(1, math.ceil(total / target_file_bytes))
    if partition_by:
        # cluster rows of one partition dir together; files-per-dir
        # follows the hash spread of the partition columns
        out = df.repartition(n_files, *[F.col(c) for c in partition_by])
        out.write.mode("overwrite").partitionBy(*partition_by).parquet(dst_path)
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    return n_files


def write_csv_export(df: DataFrame, path: str, single_file: bool = False) -> None:
    """B3/B4 — CSV export (COPY … TO STDOUT CSV HEADER,
    postgresql_connection.py:42-45; S3 upload s3_connection.py:41-53).
    ``single_file`` coalesces to 1 partition — only for small
    presentation exports; a 100 TB export keeps its partitioning."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_jdbc_append(df: DataFrame, url: str, table: str, properties: dict[str, str] | None = None) -> None:
    """B1 — JDBC append (to_sql if_exists='append', main.py:188-195)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table).mode("append")
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


# ---------------------------------------------------------------------------
# Versioned snapshot publishing — poor-man's time travel over plain parquet
# ---------------------------------------------------------------------------

def _fs_for(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jpath.getFileSystem(hconf)


def publish_version(df: DataFrame, table_dir: str) -> int:
    """Publish ``df`` as the next immutable version of a table:
    write ``{table_dir}/v{N}/`` (never touching earlier versions), then
    atomically flip the ``_LATEST`` pointer file to ``N``.

    This is Hive-style versioned-location publishing — the capability
    slice of lakehouse time travel that plain parquet supports: readers
    holding an old version keep a consistent snapshot (immutable dirs),
    rollback is a pointer flip (:func:`set_latest_version`), and a
    failed write never corrupts the current version because the pointer
    flips only after the data commit. What it does NOT give is
    row-level ACID merges — that needs a real table format's log.

    Returns the new version number. Pointer write is driver-side
    Hadoop-FS I/O (s3a/hdfs-safe), no Spark job.
    """
    spark = df.sparkSession
    versions = list_versions(spark, table_dir)
    n = (max(versions) + 1) if versions else 1
    df.write.mode("error").parquet(f"{table_dir}/v{n}")
    set_latest_version(spark, table_dir, n)
    return n


def list_versions(spark: SparkSession, table_dir: str) -> list[int]:
    """All published version numbers (sorted), from one driver-side
    directory listing."""
    jvm, fs = _fs_for(spark, table_dir)
    root = jvm.org.apache.hadoop.fs.Path(table_dir)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v") and name[1:].isdigit():
            out.append(int(name[1:]))
    return sorted(out)


def set_latest_version(spark: SparkSession, table_dir: str, version: int) -> None:
    """Flip the ``_LATEST`` pointer (rollback = point at an older
    version; the data directories are immutable either way). Writes the
    new pointer to a temp file, then renames over the final path with
    ``Options.Rename.OVERWRITE`` (FileContext) so there is no window
    where the pointer is absent; falls back to delete-then-rename on
    filesystems without FileContext, with every FS return value checked
    so a silent failure can't leave a stale pointer."""
    jvm, fs = _fs_for(spark, table_dir)
    tmp = jvm.org.apache.hadoop.fs.Path(f"{table_dir}/._LATEST.tmp")
    final = jvm.org.apache.hadoop.fs.Path(f"{table_dir}/_LATEST")
    stream = fs.create(tmp, True)
    stream.write(bytearray(str(version).encode()))
    stream.close()
    try:
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            tmp.toUri(), fs.getConf()
        )
        gw = spark.sparkContext._gateway
        opts = gw.new_array(jvm.org.apache.hadoop.fs.Options.Rename, 1)
        opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        fc.rename(tmp, final, opts)  # atomic, no missing-pointer window
        return
    except Exception:
        pass  # FileContext unsupported for this scheme — checked fallback
    if fs.exists(final) and not fs.delete(final, False):
        raise IOError(f"could not delete stale pointer {final}")
    if not fs.rename(tmp, final):
        raise IOError(f"could not publish pointer {final}")


def read_version(spark: SparkSession, table_dir: str, version: int | None = None) -> DataFrame:
    """Read a table snapshot: the ``_LATEST`` pointer's version by
    default, or any pinned historical version."""
    if version is None:
        jvm, fs = _fs_for(spark, table_dir)
        ptr = jvm.org.apache.hadoop.fs.Path(f"{table_dir}/_LATEST")
        stream = fs.open(ptr)
        try:
            version = int(bytes(stream.readAllBytes()).decode().strip())
        finally:
            stream.close()
    return spark.read.parquet(f"{table_dir}/v{version}")
