"""Pipe-delimited SSURGO text ingest tests: blank→NULL, quoting,
cointerp prune, sdv dedup, multi-survey merge."""

from __future__ import annotations

import os

from soil_data_development_tools___arcmap_spark.sources.ssurgo_text import (
    merge_surveys,
    read_ssurgo_table,
)


def write(tmp_path, name, lines):
    p = os.path.join(tmp_path, name)
    with open(p, "w", encoding="cp1252") as f:
        f.write("\n".join(lines) + "\n")
    return p


def test_blank_to_null_and_quotes(spark, tmp_path):
    p = write(
        str(tmp_path),
        "mapunit.txt",
        [
            'mu1|Aa|"Alpha loam, 0 to 2% slopes"|l1|Prime',
            "mu2|Bb||l1|",  # blank muname + farmlndcl -> NULL
        ],
    )
    df = read_ssurgo_table(spark, p, "mapunit")
    rows = {r["mukey"]: r for r in df.collect()}
    assert rows["mu1"]["muname"] == "Alpha loam, 0 to 2% slopes"
    assert rows["mu2"]["muname"] is None
    assert rows["mu2"]["farmlndcl"] is None


def test_cointerp_prune(spark, tmp_path):
    p = write(
        str(tmp_path),
        "cinterp.txt",
        [
            "i1|c1|r1|Rule One|r1|Rule One|0|0.5|Well suited",
            "i2|c1|r1|Rule One|r11|Sub Rule|1|0.4|Limited",  # pruned
            "i3|c1|54955|NCCPI|n1|NCCPI Corn|1|0.8|High",  # kept (NCCPI)
        ],
    )
    df = read_ssurgo_table(spark, p, "cointerp")
    keys = {r["cointerpkey"] for r in df.collect()}
    assert keys == {"i1", "i3"}


def test_sdv_dedup_and_merge(spark, tmp_path):
    row = (
        "1|Attr|component|col_r|float|float|2|Property|Weighted Average|"
        "|1|0|1|0|0||-1|Lower|Higher|Not rated||0||attr|"
    )
    p1 = write(str(tmp_path), "s1.txt", [row])
    p2 = write(str(tmp_path), "s2.txt", [row])
    d1 = read_ssurgo_table(spark, p1, "sdvattribute")
    d2 = read_ssurgo_table(spark, p2, "sdvattribute")
    merged = merge_surveys([d1, d2], pk=["attributekey"])
    assert merged.count() == 1  # identical catalog row per survey dedupes


def test_wss_naming_and_version_check(tmp_path):
    """WSS driver utility offline: zip/URL naming, template suffix,
    SAVEREST parse, and the overwrite decision."""
    from soil_data_development_tools___arcmap_spark.sources import wss

    assert (
        wss.wss_zip_name("NE109", 20240917)
        == "wss_SSA_NE109_[2024-09-17].zip"
    )
    assert wss.wss_zip_url("NE109", 20240917).endswith(
        "/SSA/wss_SSA_NE109_[2024-09-17].zip"
    )
    assert wss.template_db_suffix("NE109") == "_soildb_NE_2003"
    assert wss.template_db_suffix("TX123") == "_soildb_US_2003"
    assert wss.template_db_suffix("FM001") == "_soildb_HI_2003"

    rec = 'NE109|"Lancaster County"|123|09/17/2024 10:42:01|more'
    assert wss.parse_saverest(rec) == 20240917

    folder = tmp_path / "soil_ne109"
    (folder / "tabular").mkdir(parents=True)
    # absent sacatlog -> incomplete -> download
    assert wss.needs_download("NE109", 20240917, str(folder))
    (folder / "tabular" / "sacatlog.txt").write_text(rec + "\n")
    # same date -> keep; newer WSS date -> download
    assert not wss.needs_download("NE109", 20240917, str(folder))
    assert wss.needs_download("NE109", 20241001, str(folder))
    assert wss.needs_download("NE109", 20240917, str(tmp_path / "nope"))


def test_wss_unzip_conventions(tmp_path):
    """UnzipDownload folder-convention handling: zip-basename subdir,
    areasymbol subdir, bad zip, empty zip."""
    import zipfile

    from soil_data_development_tools___arcmap_spark.sources import wss

    def make_zip(path, inner):
        with zipfile.ZipFile(path, "w") as z:
            z.writestr(f"{inner}/tabular/sacatlog.txt", "x|y|z|01/02/2024 00:00:00\n")

    out = tmp_path / "o1"
    out.mkdir()
    zp = out / "wss_SSA_NE109_[2024-09-17].zip"
    make_zip(zp, "wss_SSA_NE109_[2024-09-17]")
    dest = out / "soil_ne109"
    assert wss.unzip_download(str(zp), str(out), "NE109", str(dest))
    assert (dest / "tabular" / "sacatlog.txt").is_file()
    assert not zp.exists()  # zip removed after extract

    out2 = tmp_path / "o2"
    out2.mkdir()
    zp2 = out2 / "wss_SSA_NE109_[2024-09-17].zip"
    make_zip(zp2, "NE109")
    dest2 = out2 / "soil_ne109"
    assert wss.unzip_download(str(zp2), str(out2), "ne109", str(dest2))
    assert (dest2 / "tabular" / "sacatlog.txt").is_file()

    bad = tmp_path / "bad.zip"
    bad.write_bytes(b"this is not a zip")
    assert not wss.unzip_download(str(bad), str(tmp_path), "NE109", str(tmp_path / "x"))

    empty = tmp_path / "empty.zip"
    empty.write_bytes(b"")
    assert wss.unzip_download(str(empty), str(tmp_path), "NE109", str(tmp_path / "y"))
    assert not empty.exists()


def test_wss_unzip_replaces_stale_folder(tmp_path):
    """Re-download path: a stale non-empty survey folder is removed
    before the rename (the reference rmtree's the old dataset first,
    SSURGO_BatchDownload.py:611) — os.rename onto a non-empty dir
    would raise OSError on POSIX."""
    import zipfile

    from soil_data_development_tools___arcmap_spark.sources import wss

    out = tmp_path / "o"
    out.mkdir()
    dest = out / "soil_ne109"
    (dest / "tabular").mkdir(parents=True)
    (dest / "tabular" / "sacatlog.txt").write_text(
        "x|y|z|01/02/2020 00:00:00\n"
    )
    zp = out / "wss_SSA_NE109_[2024-09-17].zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr(
            "wss_SSA_NE109_[2024-09-17]/tabular/sacatlog.txt",
            "x|y|z|09/17/2024 00:00:00\n",
        )
    assert wss.unzip_download(str(zp), str(out), "NE109", str(dest))
    # the NEW dataset replaced the stale one
    assert wss.tabular_date(str(dest)) == 20240917
    assert not (out / "wss_SSA_NE109_[2024-09-17]").exists()

    # fetch seam: download() writes via the injected fetcher, no network
    calls = {}
    def fake_fetch(url, path, t):
        calls["url"] = url
        open(path, "wb").write(b"zipbytes")
    p = wss.download("NE109", 20240917, str(tmp_path), fetch=fake_fetch)
    assert calls["url"].startswith("https://websoilsurvey")
    assert open(p, "rb").read() == b"zipbytes"


def test_dataset_sizes(tmp_path):
    """GetSizes inventory: recursive byte sizes + file counts per
    immediate subfolder, optional suffix filter."""
    from soil_data_development_tools___arcmap_spark.sources import wss

    a = tmp_path / "soil_a" / "tabular"
    a.mkdir(parents=True)
    (a / "x.txt").write_bytes(b"12345")
    (a.parent / "y.txt").write_bytes(b"12")
    b = tmp_path / "db.gdb"
    b.mkdir()
    (b / "z").write_bytes(b"1234567890")
    (tmp_path / "plain_file.txt").write_bytes(b"ignored")

    got = wss.dataset_sizes(str(tmp_path))
    assert got == [
        {"folder": "db.gdb", "bytes": 10, "n_files": 1},
        {"folder": "soil_a", "bytes": 7, "n_files": 2},
    ]
    assert wss.dataset_sizes(str(tmp_path), suffix=".gdb") == [
        {"folder": "db.gdb", "bytes": 10, "n_files": 1},
    ]


def test_multiline_narrative_fields(spark, tmp_path):
    """Real WSS exports embed newlines inside quoted narrative text
    (legendtext/mutext/cotext 'text' columns); the reference's
    csv.reader handles them, so the scan must too (multiLine mode) —
    without it a two-line field splits into two broken rows."""
    import csv
    import io

    from pyspark.sql.types import StringType, StructField, StructType

    buf = io.StringIO()
    w = csv.writer(
        buf, delimiter="|", quotechar='"', doublequote=True,
        quoting=csv.QUOTE_MINIMAL,
    )
    w.writerow(["t1", "l1", "misc", "First line.\nSecond line."])
    w.writerow(["t2", "l1", "misc", 'has "quotes" and | a pipe'])
    w.writerow(["t3", "l2", "misc", ""])  # blank -> NULL
    p = os.path.join(str(tmp_path), "legtext.txt")
    with open(p, "w", encoding="cp1252", newline="") as f:
        f.write(buf.getvalue())
    schema = StructType(
        [StructField(c, StringType()) for c in
         ("legtextkey", "lkey", "textcat", "text")]
    )
    df = read_ssurgo_table(spark, p, "legtext", schema=schema)
    rows = {r["legtextkey"]: r["text"] for r in df.collect()}
    assert rows["t1"] == "First line.\nSecond line."
    assert rows["t2"] == 'has "quotes" and | a pipe'
    assert rows["t3"] is None
    assert len(rows) == 3


def test_real_layout_export_fixture(spark):
    """Load the committed real-layout WSS tabular export fixture
    (tests/fixtures/ssurgo_export/tabular, generated by
    tools/gen_ingest_fixture.py) through the metadata-generated
    catalog — pins the raw-format quirks a synthesized round-trip
    cannot: cp1252 high bytes, CRLF terminators, quoted multiline
    narratives, embedded pipes/doubled quotes, blank->NULL, WSS iefile
    names, and the RAW 19-column cinterp.txt of which the engine keeps
    13 columns (positions [0:7]+[11:13]+[15:19]) plus the
    ruledepth==0 / NCCPI-54955 row filter — a 13-column read would
    silently seat interpll in interphr's place."""
    from soil_data_development_tools___arcmap_spark.catalog import (
        load_full_export,
    )

    fixture = os.path.join(
        os.path.dirname(__file__), "fixtures", "ssurgo_export", "tabular"
    )
    t = load_full_export(spark, fixture)
    assert set(t) >= {
        "sacatalog", "legend", "mapunit", "component", "chorizon",
        "cointerp", "mutext",
    }
    # FK order: parents before children in iteration order
    order = list(t)
    assert order.index("legend") < order.index("mapunit") < order.index(
        "component"
    ) < order.index("chorizon")

    # full catalog widths, not pruned projections
    assert len(t["component"].columns) == 109
    assert len(t["chorizon"].columns) == 171
    assert len(t["cointerp"].columns) == 13

    mu = {r["musym"]: r for r in t["mapunit"].collect()}
    assert len(mu) == 4
    assert mu["W"]["muname"] == 'Water, "open" | intermittent'
    assert mu["8999"]["mustatus"] is None  # blank -> NULL

    comp = {r["compname"]: r for r in t["component"].collect()}
    assert len(comp) == 7
    assert comp["Moody"]["comppct_r"] == 85
    assert comp["Pits"]["comppct_r"] is None

    # raw 19-col cointerp: row filter kept depth-0 roots + the NCCPI
    # submodel rows; interphr comes from position 11, NOT position 7
    ci = {r["cointerpkey"]: r for r in t["cointerp"].collect()}
    assert set(ci) == {"91001", "91004", "93001", "93004"}
    assert abs(ci["91001"]["interphr"] - 0.85) < 1e-9
    assert ci["91001"]["interphrc"] == "Somewhat limited"
    assert ci["91004"]["mrulekey"] == "54955" and ci["91004"]["ruledepth"] == 1

    mt = {r["mutextkey"]: r["text"] for r in t["mutext"].collect()}
    assert mt["77003"] is None
    narrative = mt["77001"]
    assert "\r\nIt’s suited" in narrative  # CRLF + cp1252 0x92
    assert "10°C" in narrative

    # the DEFAULT (9-field engine projection) schema must also read
    # the raw 19-column file by name, not position
    ci9 = read_ssurgo_table(
        spark, os.path.join(fixture, "cinterp.txt"), "cointerp"
    )
    rows9 = {r["cointerpkey"]: r for r in ci9.collect()}
    assert set(rows9) == {"91001", "91004", "93001", "93004"}
    assert abs(rows9["91001"]["interphr"] - 0.85) < 1e-9


def test_linesep_sniff_first_unquoted_boundary(spark, tmp_path):
    """The record-terminator sniff reports the flavor of the FIRST
    newline outside quotes; embedded newlines in quoted narratives —
    either flavor, any quantity — never vote. Pins both historical
    failure modes: a \\n file with pasted-Windows CRLFs inside quotes
    (any-CRLF rule failed) and a \\r\\n file whose first record is one
    LF-heavy narrative (count-majority rule failed)."""
    from pyspark.sql.types import StringType, StructField, StructType

    from soil_data_development_tools___arcmap_spark.sources.ssurgo_text import (
        _sniff_linesep,
    )

    # \n rows, one embedded CRLF inside a quoted field
    p_lf = os.path.join(str(tmp_path), "lf.txt")
    with open(p_lf, "wb") as f:
        f.write(b't1|l1|misc|"win\r\nline"\n')
        f.write(b"t2|l1|misc|plain\n")
        f.write(b"t3|l2|misc|\n")
    assert _sniff_linesep(p_lf) == "\n"
    # genuine WSS layout: every row \r\n-terminated
    p_crlf = os.path.join(str(tmp_path), "crlf.txt")
    with open(p_crlf, "wb") as f:
        f.write(b"t1|l1|misc|a\r\nt2|l1|misc|b\r\n")
    assert _sniff_linesep(p_crlf) == "\r\n"
    # \r\n rows whose FIRST record is one LF-heavy quoted narrative
    # (more bare LFs than CRLFs in the head — majority voting failed)
    p_heavy = os.path.join(str(tmp_path), "heavy.txt")
    with open(p_heavy, "wb") as f:
        f.write(b't1|l1|misc|"' + b"unix line\n" * 50 + b'end"\r\n')
        f.write(b"t2|l1|misc|b\r\n")
    assert _sniff_linesep(p_heavy) == "\r\n"
    # and the \n file with the embedded CRLF parses row-correct
    schema = StructType(
        [StructField(c, StringType()) for c in
         ("legtextkey", "lkey", "textcat", "text")]
    )
    rows = {
        r["legtextkey"]: r["text"]
        for r in read_ssurgo_table(
            spark, p_lf, "legtext", schema=schema
        ).collect()
    }
    assert len(rows) == 3 and rows["t1"] == "win\r\nline"
    assert rows["t3"] is None
