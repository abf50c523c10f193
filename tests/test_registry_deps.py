"""The r3 certification hole: content hashes covered only the query fn
source + oracle SQL, so a shared-helper edit (e.g. functions/normalize.py)
could change certified queries' behavior without re-entering them into
the driver's bounded check window (VERDICT r3 "What's wrong" #1) — the
mitigation was an honor-system --evict. Since r4 each query's hash folds
in the file hashes of its defining module's transitive first-party
import closure (registry._dep_hash). These tests pin the mechanism: an
edit to a helper uncertifies exactly its dependents.
"""

import shutil
import subprocess
import sys

SNIP = """\
import sys
sys.path.insert(0, sys.argv[1])
from data_ingestion_task_spark.plans import registry
registry.load_all()
for name in sys.argv[2:]:
    print(name, registry.REGISTRY[name].content_hash)
"""

# money_normalization imports functions.normalize; events_tumbling_window
# (events_plans) imports only functions.text + sources.tables, neither of
# which reaches normalize.py (verified: no first-party imports there).
NAMES = ["money_normalization", "events_tumbling_window"]


def _hashes(tmp_path):
    out = subprocess.run(
        [sys.executable, "-c", SNIP, str(tmp_path), *NAMES],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr
    toks = out.stdout.split()
    return {toks[i]: toks[i + 1] for i in range(0, len(toks), 2)}


def test_helper_edit_uncertifies_dependents_only(tmp_path):
    shutil.copytree(
        "data_ingestion_task_spark", tmp_path / "data_ingestion_task_spark"
    )
    before = _hashes(tmp_path)
    helper = tmp_path / "data_ingestion_task_spark" / "functions" / "normalize.py"
    helper.write_text(helper.read_text() + "\n# semantics tweak\n")
    after = _hashes(tmp_path)
    assert before["money_normalization"] != after["money_normalization"], (
        "editing functions/normalize.py must flip the content hash of "
        "queries that (transitively) import it"
    )
    assert before["events_tumbling_window"] == after["events_tumbling_window"], (
        "a helper edit must NOT uncertify queries outside its dependents — "
        "that would flood the driver's bounded check window"
    )


def test_dep_closure_contains_defining_module_and_helpers():
    from data_ingestion_task_spark.plans import registry

    registry.load_all()
    mod = "data_ingestion_task_spark.plans.normalize_plans"
    seen = set()
    stack = [mod]
    while stack:
        m = stack.pop()
        if m in seen:
            continue
        seen.add(m)
        stack.extend(registry._direct_deps(m))
    assert mod in seen
    assert "data_ingestion_task_spark.functions.normalize" in seen
    assert "data_ingestion_task_spark.plans.registry" not in seen, (
        "registry itself is excluded by design (see _DEP_EXCLUDE)"
    )
