"""CSV page-ingestion source tests (SURVEY §2.1 entry point)."""

from __future__ import annotations

from data_ingestion_task_spark.sources.pages_csv import load_pages_csv, pages_to_documents


def test_pages_csv_roundtrip(spark, tmp_path):
    docs = {
        ("EML", "a"): ["page one text", "page two text"],
        ("FAX", "b"): ["single page"],
        ("SCN", "c"): ["x", "", "z"],  # blank middle page preserved
    }
    for (ch, fn), pages in docs.items():
        d = tmp_path / ch
        d.mkdir(exist_ok=True)
        (d / f"{fn}.csv").write_text("\n".join(pages) + "\n")
    (tmp_path / "WIN").mkdir()
    (tmp_path / "WIN" / "d.csv").write_text("no trailing newline")

    pages = load_pages_csv(spark, str(tmp_path))
    rows = {(r.channel, r.fn, r.pe_num): r.text for r in pages.collect()}
    assert rows[("EML", "a", 1)] == "page one text"
    assert rows[("EML", "a", 2)] == "page two text"
    assert rows[("FAX", "b", 1)] == "single page"
    assert rows[("SCN", "c", 2)] == ""  # blank page kept
    assert rows[("SCN", "c", 3)] == "z"
    assert rows[("WIN", "d", 1)] == "no trailing newline"
    assert len(rows) == 7

    consolidated = {r.fn: r for r in pages_to_documents(pages).collect()}
    assert consolidated["a"].doc_text == "page one text\npage two text"
    assert consolidated["a"].n_pages == 2
    assert consolidated["c"].doc_text == "x\n\nz"
    assert consolidated["d"].channel == "WIN"
