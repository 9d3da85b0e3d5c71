"""Static audit of ``pin()`` call sites (pin.py marker discipline).

VERDICT r15 Next #4: the broadcast gate's acknowledged blind spot is a
``pin()``-ed frame (lineage truncates to ``Scan ExistingRDD`` at plan
time), and the r15 ``minhash_estimate_error`` defect — a corpus-grain
pin carrying a wide shingle array — slipped in exactly there, one
round after the policy exception was codified. This tool closes the
static half of the gate: it walks every ``pin(`` / ``.transform(pin)``
call site in the package and requires each to carry a classification
marker on the call line or within the six lines above it:

- ``# pin-bounded: <reason>`` — cardinality corpus-independent
- ``# narrow-pin: <width>``   — corpus-grain, narrow fixed-width
  (``pin()`` itself enforces the no-unbounded-columns half at
  runtime; see pin.py)

pytest wires ``audit_pins`` into the suite (tests/test_pin_audit.py);
CLI usage prints one line per site:

    python tools/pin_audit.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "datapipelinedemo_spark",
)

# A pin()/pin_persist() invocation: a bare call (not the def, not an
# attribute like foo.pin, not another identifier's suffix) or the
# `.transform(pin)` / `.transform(pin_persist)` form.
_CALL = re.compile(
    r"(?<![\w.])pin(?:_persist)?\("
    r"|\.transform\(\s*pin(?:_persist)?\s*[,)]"
)
_DEF = re.compile(r"^\s*def pin(?:_persist)?\(")
_MARK = re.compile(r"#\s*(narrow-pin|pin-bounded):\s*(.*)")


def pin_sites(root: str = _PKG) -> list[dict]:
    """Every pin call site: {file, line, kind, note}; kind is
    'narrow' | 'bounded' | None (unmarked)."""
    sites: list[dict] = []
    for dirpath, _dirs, files in os.walk(root):
        for name in sorted(files):
            if not name.endswith(".py"):
                continue
            path = os.path.join(dirpath, name)
            if os.path.basename(path) == "pin.py":
                continue  # the definition + docstring examples
            with open(path, encoding="utf-8") as fh:
                lines = fh.readlines()
            for i, line in enumerate(lines):
                if _DEF.match(line) or not _CALL.search(line):
                    continue
                kind = note = None
                for j in range(i, max(i - 7, -1), -1):
                    if j < i and _CALL.search(lines[j]):
                        break  # that marker region belongs to the
                        # nearer call above, not this site
                    m = _MARK.search(lines[j])
                    if m:
                        kind = (
                            "narrow"
                            if m.group(1) == "narrow-pin"
                            else "bounded"
                        )
                        note = m.group(2).strip()
                        break
                sites.append(
                    {
                        "file": os.path.relpath(path, os.path.dirname(root)),
                        "line": i + 1,
                        "kind": kind,
                        "note": note,
                    }
                )
    return sites


def audit_pins(root: str = _PKG) -> list[dict]:
    """Unmarked pin call sites (the violations)."""
    return [s for s in pin_sites(root) if s["kind"] is None]


def main() -> None:
    sites = pin_sites()
    for s in sites:
        tag = s["kind"] or "UNMARKED"
        print(f"{s['file']}:{s['line']} {tag} {s['note'] or ''}")
    bad = [s for s in sites if s["kind"] is None]
    print(f"{len(sites)} sites, {len(bad)} unmarked")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
