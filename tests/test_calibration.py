"""calibration_report invariants: agreement with the certified
ece_calibration scalar, MCE dominance, Brier bounds, mass
conservation."""

from data_ingestion_task_spark.plans.calibration_plans import calibration_report
from data_ingestion_task_spark.plans.eval_plans import ece_calibration
from data_ingestion_task_spark.sources.tables import load_table


def test_calibration_report_invariants(spark, sf_dir):
    rows = {r["bin"]: r for r in calibration_report(spark, sf_dir).collect()}
    bins = {k: v for k, v in rows.items() if k not in ("ECE", "MCE", "BRIER")}

    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n"] for r in bins.values()) == total
    assert all(r["n"] == total for k, r in rows.items() if k in ("ECE", "MCE", "BRIER"))

    # MCE is the worst bin gap; ECE (mass-weighted mean gap) can't exceed it
    assert rows["MCE"]["value"] == max(r["value"] for r in bins.values())
    assert rows["ECE"]["value"] <= rows["MCE"]["value"] + 1e-9
    assert 0.0 <= rows["BRIER"]["value"] <= 1.0

    # the ECE row reproduces the certified ece_calibration scalar
    ece_rows = {r["bin"]: r for r in ece_calibration(spark, sf_dir).collect()}
    assert abs(rows["ECE"]["value"] - ece_rows["ECE"]["ece_contrib"]) < 2e-6
