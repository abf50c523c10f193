"""Artifact renderer tests (SURVEY §2.12: the reference's
confusion_matrix.png / classification_report.png deliverables,
classifi_confu.py:26-89)."""

import pytest

from data_ingestion_task_spark.plans.eval_plans import (
    classification_report,
    confusion_matrix,
)
from data_ingestion_task_spark.sources.reporting import (
    render_table_png,
    render_table_text,
    save_eval_artifacts,
)


def test_text_table_deterministic(spark, sf_dir, tmp_path):
    cm = confusion_matrix(spark, sf_dir)
    p1 = render_table_text(cm, str(tmp_path / "cm1.txt"))
    p2 = render_table_text(cm, str(tmp_path / "cm2.txt"))
    b1, b2 = open(p1).read(), open(p2).read()
    assert b1 == b2
    # header + separators + one row per matrix row
    assert b1.count("\n") == cm.count() + 4
    assert "true_label" in b1


def test_row_limit_guard(spark, tmp_path):
    big = spark.range(50)
    with pytest.raises(ValueError, match="aggregate outputs"):
        render_table_text(big, str(tmp_path / "big.txt"), max_rows=10)


def test_save_eval_artifacts_pair(spark, sf_dir, tmp_path):
    out = save_eval_artifacts(
        {
            "confusion_matrix": confusion_matrix(spark, sf_dir),
            "classification_report": classification_report(spark, sf_dir),
        },
        str(tmp_path / "artifacts"),
    )
    assert set(out) == {"confusion_matrix", "classification_report"}
    for paths in out.values():
        assert any(p.endswith(".txt") for p in paths)
    try:
        import matplotlib  # noqa: F401

        assert all(any(p.endswith(".png") for p in ps) for ps in out.values())
    except ImportError:
        assert all(len(ps) == 1 for ps in out.values())


def test_api_save_evaluation_report_e2e(spark, sf_dir, tmp_path):
    """VERDICT r3 item 7: the pipeline facade must end with artifacts
    on disk (the reference's acceptance deliverable), and the written
    confusion-matrix artifact must match the oracle-checked
    confusion_matrix query's output byte-for-byte."""
    from data_ingestion_task_spark import api

    out_dir = tmp_path / "artifacts"
    written = api.save_evaluation_report(spark, sf_dir, str(out_dir))
    assert set(written) == {"confusion_matrix", "classification_report"}
    artifact = (out_dir / "confusion_matrix.txt").read_text()
    reference = render_table_text(
        confusion_matrix(spark, sf_dir), str(tmp_path / "expected.txt")
    )
    assert artifact == open(reference).read()
    assert (out_dir / "classification_report.txt").read_text().count("\n") > 4


def test_png_gate_without_matplotlib(spark, sf_dir, tmp_path):
    try:
        import matplotlib  # noqa: F401

        pytest.skip("matplotlib present - gate not exercised; PNG path covered above")
    except ImportError:
        with pytest.raises(ImportError, match="matplotlib"):
            render_table_png(confusion_matrix(spark, sf_dir), str(tmp_path / "cm.png"))
