"""Generate the ``_VERIFY_FIRST`` rotation list MECHANICALLY from the
CORRECTNESS_r*.json history (VERDICT r11 #2 — the hand-curated list
missed 11 r7-aged rows because it was transcribed from the verdict's
prose instead of computed).

The correctness driver verifies registry entries in insertion order and
caps near 50 rows per round, so the list must put first the rows whose
driver evidence is WEAKEST:

1. queries with no green driver row in ANY round (new queries, or rows
   that only ever errored),
2. queries the caller names as CHANGED-CODE this round (``--changed``),
3. everything else ordered by newest-green round ASCENDING (oldest
   evidence first), name as the tiebreak.

Green means hash-matched against the oracle, or executed rows-only for
queries registered without an oracle by design.

Usage (from the repo root, per-round close-out):

    python tools/gen_verify_first.py [--changed q1,q2,...]

Prints a ready-to-paste Python tuple annotated with each row's
newest-green round.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green(rec: dict) -> bool:
    if rec.get("hash_match") is True:
        return True
    # rows-only-by-design rows: the driver records no oracle; green =
    # the Spark side executed and produced a row count
    return rec.get("err") == "no_oracle" and rec.get("spark_rows") is not None


def newest_green_rounds(repo: str = REPO) -> dict[str, int]:
    """query -> newest round number with a green driver row."""
    newest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            if _green(rec):
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def registry_names() -> list[str]:
    """Every query name the current registry exposes (module order)."""
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    queries, _ = e._registry()
    return list(queries)


def rotation(changed: list[str] | None = None) -> list[tuple[str, int]]:
    """The computed rotation: (name, newest_green_round) pairs, 0 for
    never-green. ``changed`` rows are promoted right after the
    never-green block (their newest green row predates this round's
    code by definition)."""
    newest = newest_green_rounds()
    names = registry_names()
    unknown = [c for c in (changed or []) if c not in names]
    if unknown:
        # a typo here silently demotes a changed query to its aged
        # rotation slot — exactly the miss this tool exists to prevent
        raise ValueError(
            f"--changed names not in the registry: {unknown}"
        )
    changed = list(changed or [])
    new = sorted(n for n in names if newest.get(n, 0) == 0)
    chg = [n for n in changed if n not in new]
    rest = sorted(
        (n for n in names if n not in new and n not in chg),
        key=lambda n: (newest[n], n),
    )
    return (
        [(n, 0) for n in new]
        + [(n, newest[n]) for n in chg]
        + [(n, newest[n]) for n in rest]
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--changed",
        default="",
        help="comma-separated query names whose code changed this round",
    )
    args = ap.parse_args()
    changed = [c.strip() for c in args.changed.split(",") if c.strip()]
    rows = rotation(changed)
    print("_VERIFY_FIRST = (")
    for name, rnd in rows:
        tag = "never-green" if rnd == 0 else f"newest green r{rnd}"
        if name in changed:
            tag += ", CHANGED this round"
        print(f'    "{name}",  # {tag}')
    print(")")


if __name__ == "__main__":
    main()
