"""Round-over-round COLD-column regression report (VERDICT r6 #6).

The driver-parsed bench line carries only WARM timings; the cold
column (first-execution cost: plan compile + codegen JIT + stage-cache
fill) lives in the ``bench_cold.json`` sidecar — and nothing diffed it
round over round, which is how round 5's llm_prep cold regression
carried silently. This script compares the current sidecar against a
baseline (default: the last committed version, ``git show
HEAD:bench_cold.json``) and fails loudly on >1.5x per-lane cold
regressions.

Usage:
    python tools/cold_report.py                    # vs HEAD's sidecar
    python tools/cold_report.py old.json           # vs a file
    python tools/cold_report.py old.json new.json  # explicit pair

Exit code 1 iff any common lane regressed past the threshold.
Wired into the round checklist (.claude/skills/verify/SKILL.md): run
after ``python bench.py`` refreshes the sidecar.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

THRESHOLD = 1.5
# lanes cheaper than this are dominated by scheduler noise at sf0.1;
# a ratio over one of these is not a regression signal
NOISE_FLOOR_SEC = 0.3

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(src: str) -> dict[str, float]:
    with open(src) as f:
        doc = json.load(f)
    return doc.get("queries_cold", {})


def _load_git_head() -> dict[str, float]:
    out = subprocess.run(
        ["git", "-C", REPO, "show", "HEAD:bench_cold.json"],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout).get("queries_cold", {})


def main() -> int:
    args = sys.argv[1:]
    if len(args) >= 2:
        old, new = _load(args[0]), _load(args[1])
        old_src = args[0]
    elif len(args) == 1:
        old, new = _load(args[0]), _load(os.path.join(REPO, "bench_cold.json"))
        old_src = args[0]
    else:
        old, new = _load_git_head(), _load(os.path.join(REPO, "bench_cold.json"))
        old_src = "HEAD:bench_cold.json"

    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    regressed: list[tuple[str, float, float, float]] = []
    improved = 0
    for name in common:
        o, n = old[name], new[name]
        ratio = n / o if o > 0 else float("inf")
        if ratio > THRESHOLD and max(o, n) > NOISE_FLOOR_SEC:
            regressed.append((name, o, n, ratio))
        elif ratio < 1 / THRESHOLD:
            improved += 1

    print(f"cold report vs {old_src}: {len(common)} common lanes, "
          f"{improved} improved >{THRESHOLD}x, {len(regressed)} regressed >{THRESHOLD}x")
    for name, o, n, ratio in sorted(regressed, key=lambda r: -r[3]):
        print(f"  REGRESSED {name}: {o:.3f}s -> {n:.3f}s ({ratio:.2f}x)")
    if added:
        print(f"  new lanes (no baseline): {', '.join(f'{a} {new[a]:.3f}s' for a in added)}")
    if removed:
        print(f"  removed lanes: {', '.join(removed)}")
    tot_o = sum(old[n] for n in common)
    tot_n = sum(new[n] for n in common)
    if common and tot_o > 0:
        print(f"  common-lane cold total: {tot_o:.2f}s -> {tot_n:.2f}s "
              f"({tot_n / tot_o:.2f}x)")
    return 1 if regressed else 0


if __name__ == "__main__":
    raise SystemExit(main())
