"""Generate the __spark_entry__.PRIORITY certification window from the
driver's CORRECTNESS artifacts — the bookkeeping that went stale by
hand twice (VERDICT r10 #2, ADVICE r11).

Policy (the standing rotation contract):
1. entries NEW since the last driver round (in the catalog, never in
   any CORRECTNESS artifact) come first;
2. then entries named in ``--changed`` (plans changed this round —
   they need re-certification regardless of freshness);
3. then all remaining entries in ascending freshness (latest green
   driver round, ties alphabetical) until the 50-entry window fills.

Prints the generated window with a freshness annotation per row and
the summary banner line; the builder pastes/adapts it into
__spark_entry__.py (the list stays reviewed-in-source so the judge
can diff it, but its CONTENT is artifact-derived).

Usage: python tools/gen_priority.py [--changed name,name,...]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def latest_green(repo: str) -> dict[str, int]:
    out: dict[str, int] = {}
    # numeric extraction, not a two-digit glob — r100+ artifacts must
    # not be silently skipped (the ADVICE r14 class, fixed everywhere);
    # anchored fullmatch per ADVICE r15 (no *_backup.json shadowing)
    for p in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", os.path.basename(p))
        if not m:
            continue
        n = int(m.group(1))
        try:
            d = json.load(open(p))
        except (OSError, ValueError):
            continue
        for name, res in d.items():
            if isinstance(res, dict) and (
                res.get("hash_match")
                or (res.get("rows_match") and res.get("err") is None)
            ):
                out[name] = max(out.get(name, 0), n)
    return out


def main() -> None:
    changed: list[str] = []
    args = sys.argv[1:]
    if args and args[0] == "--changed":
        changed = [c for c in args[1].split(",") if c]
        args = args[2:]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as e

    catalog = list(e.queries())
    fresh = latest_green(repo)

    new = [n for n in catalog if n not in fresh]
    chg = [n for n in changed if n in catalog and n not in new]
    rest = sorted(
        (n for n in catalog if n not in new and n not in chg),
        key=lambda n: (fresh.get(n, 0), n),
    )
    window = (new + chg + rest)[:WINDOW]

    from collections import Counter

    hist = Counter(fresh.values())
    print(
        "# freshness:",
        " / ".join(f"{c} r{r}" for r, c in sorted(hist.items(), reverse=True)),
        f"| catalog {len(catalog)} | new {len(new)} | changed {len(chg)}",
    )
    for n in window:
        tag = "NEW" if n in new else ("CHG" if n in chg else f"r{fresh[n]}")
        print(f'    "{n}",  # {tag}')
    nxt = rest[len(window) - len(new) - len(chg):][:5]
    print(f"# next-round head: {nxt}")


if __name__ == "__main__":
    main()
