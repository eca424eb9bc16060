"""Re-anchor BASELINE.md rows from a quiet perf_anchor sweep.

VERDICT r13 task #7: sub-second anchors set as old-estimator floors
below ambient noise generate false >2x flags every round. This tool
reads a `tools/perf_anchor.py` output file, and for every swept query
whose measured quiet min EXCEEDS its BASELINE.md anchor, rewrites the
anchor to the measured min with provenance (old value preserved in the
note). Queries whose anchor is still reachable (min <= anchor) are
left untouched — a reachable floor is a valid floor.

    python tools/reanchor.py /tmp/sweep.txt "q1 control 0.52"   # apply
    python tools/reanchor.py /tmp/sweep.txt "..." --dry-run
"""

from __future__ import annotations

import re
import sys

BASELINE = "BASELINE.md"


def main(argv: list[str]) -> int:
    sweep_path, control_note = argv[0], argv[1]
    dry = "--dry-run" in argv
    mins: dict[str, float] = {}
    for line in open(sweep_path):
        m = re.match(r"^([a-z_0-9]+): reps=.* min=([0-9.]+) ", line)
        if m:
            mins[m.group(1)] = float(m.group(2))
    out, changed = [], []
    for line in open(BASELINE):
        m = re.match(r"^\| ([a-z_0-9]+) \| ([0-9.]+) \| (.*) \|$", line)
        if m and m.group(1) in mins:
            name, old = m.group(1), float(m.group(2))
            new = mins[name]
            if new > old:
                note = (
                    f"round-14 re-anchor to quiet 4-rep min "
                    f"({control_note}; was {old}: {m.group(3)})"
                )
                line = f"| {name} | {new:.3f} | {note} |\n"
                changed.append((name, old, new))
        out.append(line)
    for name, old, new in changed:
        print(f"{name}: {old} -> {new:.3f}")
    print(f"{len(changed)} rows re-anchored, {len(mins)} swept")
    if not dry:
        open(BASELINE, "w").writelines(out)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
