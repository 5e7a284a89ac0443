#!/usr/bin/env python3
"""Decide the shipped kernel configuration from a phase-3 sweep.

Reads the sweep JSONL produced by ``tools/tpu_session.sh phase3`` (one
bench JSON per tried env combination) and applies the decision rules
fixed in round 3's STATUS pickup list:

- ``FLOODER_WITNESS_ORDER=kd`` becomes the default iff it strictly wins
  over the Hilbert baseline (round-4 verdict item 2 superseded round 3's
  0.1 s adoption threshold: kd's 0.04 s margin *was* the distance
  between vs_baseline 1.017 and <1.0 — adopt the median winner).
  DECIDED 2026-08-19: kd won 1.3647 s (0.975) vs 1.4229 (1.016) with
  5 reps each in one session (tpu_runs/sweep_r05.jsonl) and is now the
  engine's unconditional ordering; the knob no longer exists.
- ``FLOODER_PALLAS_MXU=1`` becomes the default iff it wins AND the
  full-size oracle tier passes on hardware under the flag (the oracle
  gate is printed as a required follow-up, not auto-run here).
- ``FLOODER_PALLAS_PHASES=2`` becomes the default iff it wins (the
  adaptive-floor model prices its break-even launch overhead; hardware
  wall-clock is the final arbiter).
- every loser's env knob is deleted from the engine (verdict r3 #2: the
  hot engine must contain no unmeasured code paths).

Usage: python tools/sweep_decide.py tpu_runs/sweep_r04.jsonl
       python tools/sweep_decide.py --winner-env tpu_runs/sweep_r04.jsonl
           # prints ONLY the winning combo's env string (empty for the
           # shipped default) — phase4 sources this so the full bench and
           # stress configs run under the best measured configuration
           # without waiting for a human between phases
"""

import json
import os
import subprocess
import sys


def _head_sha() -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=root, capture_output=True, text=True, check=True,
    ).stdout.strip()


def _read_rows(path: str):
    """Per-line lenient sweep parsing shared by main() and winner_env():
    a single malformed/truncated line (appends across reruns make that
    likely) must not poison the rest — and a row whose value is not a
    number must not crash a comparison later."""
    rows = []
    try:
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if isinstance(r, dict) and isinstance(
                    r.get("value"), (int, float)
                ):
                    rows.append(r)
    except OSError:
        pass
    return rows


def winner_env(path: str) -> str:
    """The winning combo's env string from a sweep file, "" if the
    default won or nothing usable was measured at the current HEAD."""
    rows = [r for r in _read_rows(path) if r.get("sha", "") == _head_sha()]
    if not rows:
        return ""
    best = {}
    for r in rows:
        env = r.get("env", "").strip()
        if env not in best or r["value"] < best[env]["value"]:
            best[env] = r
    return min(best.values(), key=lambda r: r["value"]).get("env", "")


def main(path: str) -> None:
    rows = _read_rows(path)
    if not rows:
        print("no sweep rows parsed", file=sys.stderr)
        sys.exit(1)

    # Phase3 appends across reruns; a rerun AFTER a kernel change must not
    # let a stale (faster, pre-fix) row win a flag decision for code that
    # no longer exists. Rows are sha-stamped at measurement time; only
    # rows from the current HEAD count.
    sha = _head_sha()
    stale = [r for r in rows if r.get("sha", "") != sha]
    rows = [r for r in rows if r.get("sha", "") == sha]
    if stale:
        print(
            f"WARNING: discarded {len(stale)} sweep row(s) from other "
            f"commits ({sorted({r.get('sha', '<unstamped>') for r in stale})}); "
            f"deciding only from rows measured at HEAD {sha}",
            file=sys.stderr,
        )
    if not rows:
        print(
            f"no sweep rows from current HEAD {sha} — re-run phase3 "
            "before deciding (stale rows measured different code)",
            file=sys.stderr,
        )
        sys.exit(1)

    # keep the best (lowest) value per env combo (reruns overwrite)
    best = {}
    for r in rows:
        env = r.get("env", "").strip()
        if env not in best or r["value"] < best[env]["value"]:
            best[env] = r

    baseline = best.get("", None)
    ranked = sorted(best.values(), key=lambda r: r["value"])
    def _vsb(r):
        v = r.get("vs_baseline")
        return f"{v:8.3f}" if v is not None else "     n/a"

    print(f"{'time(s)':>9}  {'vs_base':>8}  env")
    for r in ranked:
        print(f"{r['value']:9.4f}  {_vsb(r)}  "
              f"{r.get('env', '') or '(default)'}")

    win = ranked[0]
    wenv = win.get("env", "")
    print()
    print(f"WINNER: [{wenv or 'default'}] at {win['value']:.4f} s "
          f"(vs_baseline {_vsb(win).strip()})")
    if baseline is not None:
        delta = baseline["value"] - win["value"]
        print(f"  margin over shipped default: {delta:+.4f} s")

    def flag_delta(flag: str):
        """Best time with the flag vs best time without it."""
        w = [r["value"] for e, r in best.items() if flag in e]
        wo = [r["value"] for e, r in best.items() if flag not in e]
        if not w or not wo:
            return None
        return min(wo) - min(w)  # >0: flag helps

    print()
    print("per-flag margins (best-with minus best-without, >0 = helps):")
    decisions = []
    for flag, rule in [
        ("FLOODER_WITNESS_ORDER=kd", 0.0),
        ("FLOODER_PALLAS_MXU=1", 0.0),
        ("FLOODER_PALLAS_PHASES=2", 0.0),
        ("FLOODER_PALLAS_SUB=256", 0.0),
        ("FLOODER_PALLAS_RT=256", 0.0),
    ]:
        d = flag_delta(flag)
        if d is None:
            continue
        # thresholded flags (kd: "default iff it wins >= 0.1 s") adopt AT
        # the threshold; zero-rule flags must strictly win or the simpler
        # code path ships
        verdict = "ADOPT" if (d >= rule if rule else d > 0) else "DELETE"
        decisions.append((flag, d, verdict))
        print(f"  {flag:<28} {d:+.4f} s  -> {verdict}"
              f"{' (needs oracle gate on hardware)' if 'MXU' in flag and verdict == 'ADOPT' else ''}")

    print()
    print("next: set the winning combo as the shipped default "
          "(ops/pallas_flood.py constants), delete every DELETE flag's "
          "code path, and re-run the full-size oracle tier under the "
          "final configuration.")


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--winner-env":
        print(winner_env(args[1] if len(args) > 1
                         else "tpu_runs/sweep_r04.jsonl"))
        sys.exit(0)
    main(args[0] if args else "tpu_runs/sweep_r04.jsonl")
