"""Round-over-round bench regression report (VERDICT r6 #6, r7 #3).

The driver-parsed bench line carries only the warm TOTAL; the per-lane
columns live in the ``bench_cold.json`` sidecar — ``queries_cold``
(first-execution cost: plan compile + codegen JIT + stage-cache fill)
and, since round 8, ``queries_warm`` (best-of-N steady state). Nothing
diffed cold round-over-round before round 7 (which is how round 5's
llm_prep cold regression carried silently), and nothing diffed warm
before round 8 (round 7's clearCache-per-lane change made warm
comparisons meaningful for the first time — earlier warm numbers rode
cross-lane caches). This script compares the current sidecar against a
baseline (default: the last committed version, ``git show
HEAD:bench_cold.json``) and fails loudly on >1.5x per-lane regressions
in EITHER column.

Usage:
    python tools/cold_report.py                    # vs HEAD's sidecar
    python tools/cold_report.py old.json           # vs a file
    python tools/cold_report.py old.json new.json  # explicit pair

Exit code 1 iff any common lane regressed past the threshold in either
column. Wired into the round checklist
(.claude/skills/verify/SKILL.md): run after ``python bench.py``
refreshes the sidecar. Warm numbers on this box carry ±25-30% noise
between runs (SCALE.md) — re-run on a quiet box before believing a
flagged warm regression, and decide optimizations by clearCache A/B
probes, not single bench deltas.
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


def _load(src: str) -> dict:
    with open(src) as f:
        return json.load(f)


def _load_git_head() -> dict:
    out = subprocess.run(
        ["git", "-C", REPO, "show", "HEAD:bench_cold.json"],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout)


def _diff_column(
    label: str, old: dict[str, float], new: dict[str, float], cal: float = 1.0
) -> int:
    """Print the regression report for one timing column; return the
    number of >THRESHOLD regressions above the noise floor. ``cal`` is
    the box-speed ratio (new calibration / old calibration) from the
    sidecars' fixed data-independent probe (VERDICT r8 #2): lane
    ratios are divided by it, so a uniformly slow measurement window
    no longer reads as a fleet of regressions."""
    if not old or not new:
        print(f"{label}: column absent on one side "
              f"(old {len(old)} lanes, new {len(new)}) — skipped")
        return 0
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    regressed: list[tuple[str, float, float, float]] = []
    improved = 0
    for name in common:
        o, n = old[name], new[name]
        ratio = (n / o if o > 0 else float("inf")) / cal
        if ratio > THRESHOLD and max(o, n) > NOISE_FLOOR_SEC:
            regressed.append((name, o, n, ratio))
        elif ratio < 1 / THRESHOLD:
            improved += 1

    cal_note = f", calibrated /{cal:.2f}" if cal != 1.0 else ""
    print(f"{label}: {len(common)} common lanes, "
          f"{improved} improved >{THRESHOLD}x, "
          f"{len(regressed)} regressed >{THRESHOLD}x{cal_note}")
    for name, o, n, ratio in sorted(regressed, key=lambda r: -r[3]):
        print(f"  REGRESSED {name}: {o:.3f}s -> {n:.3f}s ({ratio:.2f}x calibrated)")
    if added:
        print(f"  new lanes (no baseline): "
              f"{', '.join(f'{a} {new[a]:.3f}s' for a in added)}")
    if removed:
        print(f"  removed lanes: {', '.join(removed)}")
    tot_o = sum(old[n] for n in common)
    tot_n = sum(new[n] for n in common)
    if common and tot_o > 0:
        print(f"  common-lane total: {tot_o:.2f}s -> {tot_n:.2f}s "
              f"({tot_n / tot_o:.2f}x)")
    return len(regressed)


def main() -> int:
    args = sys.argv[1:]
    if len(args) >= 2:
        old_doc, new_doc = _load(args[0]), _load(args[1])
        old_src = args[0]
    elif len(args) == 1:
        old_doc = _load(args[0])
        new_doc = _load(os.path.join(REPO, "bench_cold.json"))
        old_src = args[0]
    else:
        old_doc = _load_git_head()
        new_doc = _load(os.path.join(REPO, "bench_cold.json"))
        old_src = "HEAD:bench_cold.json"

    print(f"bench regression report vs {old_src}")
    cal = 1.0
    oc, nc = old_doc.get("calibration_sec"), new_doc.get("calibration_sec")
    if oc and nc:
        cal = nc / oc
        print(f"box-speed calibration: {oc:.3f}s -> {nc:.3f}s "
              f"(window ratio {cal:.2f}x; lane ratios normalized by it)")
    elif nc:
        print(f"box-speed calibration: {nc:.3f}s (baseline sidecar has none "
              "— raw ratios reported)")
    iso = new_doc.get("isolation_warm") or {}
    if iso:
        print("isolation re-measures (clean JIT neighborhood): "
              + ", ".join(f"{k} {v:.3f}s" for k, v in sorted(iso.items())))
    n_bad = _diff_column(
        "cold", old_doc.get("queries_cold", {}), new_doc.get("queries_cold", {}), cal
    )
    n_bad += _diff_column(
        "warm", old_doc.get("queries_warm", {}), new_doc.get("queries_warm", {}), cal
    )
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
