"""Maintain the driver-check ledger (plans/driver_checked.json).

The query registry orders its output so that UNCERTIFIED queries —
never driver-checked, or edited since their last green check — sort
before everything else (registry._ordered_names). This tool is the
ONLY writer of the ledger backing that rule:

  python tools/record_driver_check.py CORRECTNESS_rN.json
      Record the CURRENT content hash for every query the artifact
      shows fully green (rows+schema+hash for oracled queries;
      rows-only queries need rows_match). MUST be run at round start,
      BEFORE any source edits — the hash recorded must be the hash of
      the source the driver actually checked. If sources were already
      edited, pass --only with the names still untouched, or skip
      those names entirely (they simply stay uncertified — safe).

  python tools/record_driver_check.py --evict NAME [NAME...]
      Remove names from the ledger (manual escape hatch; since r4 the
      content hash already covers each query's transitive first-party
      import closure, so helper edits self-evict).

  python tools/record_driver_check.py --rehash
      Re-stamp every certified entry with the CURRENT-scheme content
      hash. ONLY valid immediately after a change to the hashing
      scheme itself (plans/registry.py) on a clean tree where no query
      fn/oracle/helper changed since the entries were certified —
      otherwise it would stamp post-edit definitions as checked.
      Refuses on a dirty engine tree.

Safety direction: a wrongly-ABSENT ledger entry only costs a redundant
re-check; a wrongly-PRESENT one hides a changed query from the driver
— so every ambiguous case here resolves to "leave uncertified".
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main() -> int:
    from data_ingestion_task_spark.plans import registry

    registry.load_all()
    ledger = registry.checked_ledger()

    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 2

    if args[0] == "--evict":
        for name in args[1:]:
            if ledger.pop(name, None) is not None:
                print(f"evicted {name}")
            else:
                print(f"not in ledger: {name}")
    elif args[0] == "--rehash":
        import subprocess

        dirty = subprocess.run(
            ["git", "status", "--porcelain", "--", "data_ingestion_task_spark"],
            capture_output=True,
            text=True,
        ).stdout.strip()
        if dirty:
            print(
                "REFUSING to rehash: engine tree dirty —\n"
                f"{dirty}\n"
                "--rehash is only valid when the certified definitions are "
                "unchanged and only the hash SCHEME moved. Commit first."
            )
            return 1
        for name in list(ledger):
            spec = registry.REGISTRY.get(name)
            if spec is None:
                ledger.pop(name)
                print(f"pruned stale entry {name}")
            else:
                ledger[name] = spec.content_hash
                print(f"rehashed {name}")
    else:
        path = args[0]
        only = set(args[args.index("--only") + 1 :]) if "--only" in args else None
        # Enforce the 'run before any edits' precondition instead of
        # trusting it: certifying from a dirty tree would stamp
        # POST-edit hashes as driver-checked, re-opening exactly the
        # changed-query-escapes-the-window hole the ledger closes.
        if "--force" not in args:
            import subprocess

            def _git(*a: str) -> str:
                return subprocess.run(
                    ["git", *a], capture_output=True, text=True
                ).stdout.strip()

            dirty = _git("status", "--porcelain", "--", "data_ingestion_task_spark")
            if dirty:
                print(
                    "REFUSING to certify: engine sources have uncommitted changes —\n"
                    f"{dirty}\n"
                    "the hashes recorded must be of the source the driver checked.\n"
                    "Commit/stash first, or pass --force if the dirty files are\n"
                    "provably unrelated to any query fn/oracle."
                )
                return 1
            # Committed-after-check edits are just as disqualifying as
            # uncommitted ones: the driver verified the sources as of
            # the commit that produced the CORRECTNESS artifact, so any
            # engine commit NEWER than the artifact's last commit means
            # current hashes are not what the driver checked.
            art_commit = _git("log", "-1", "--format=%H", "--", path)
            if art_commit:
                newer = _git(
                    "log", "--oneline", f"{art_commit}..HEAD", "--",
                    "data_ingestion_task_spark",
                )
                if newer:
                    print(
                        "REFUSING to certify: engine commits landed AFTER the "
                        f"artifact {path} was recorded —\n{newer}\n"
                        "run this tool at round start before editing, or --force "
                        "if those commits touched no query fn/oracle."
                    )
                    return 1
        args = [a for a in args if a != "--force"]
        with open(path) as f:
            results = json.load(f)
        for name, res in results.items():
            if only is not None and name not in only:
                continue
            spec = registry.REGISTRY.get(name)
            if spec is None:
                print(f"skip {name}: not registered")
                continue
            green = bool(res.get("rows_match")) and not res.get("err")
            if spec.oracle is not None:
                green = green and bool(res.get("schema_match")) and bool(res.get("hash_match"))
            if green:
                ledger[name] = spec.content_hash
                print(f"certified {name}")
            else:
                ledger.pop(name, None)
                print(f"NOT green, evicted if present: {name}")
        for name in [n for n in ledger if n not in registry.REGISTRY]:
            ledger.pop(name)
            print(f"pruned stale entry (no longer registered): {name}")

    with open(registry.CHECKED_LEDGER_PATH, "w") as f:
        json.dump(dict(sorted(ledger.items())), f, indent=1)
        f.write("\n")
    uncert = registry.uncertified_names()
    print(f"\nledger: {len(ledger)} certified; {len(uncert)} uncertified -> sort first")
    print("uncertified:", ", ".join(uncert))
    return 0


if __name__ == "__main__":
    sys.exit(main())
