"""Headline bench with an uncertainty band (VERDICT r5 #2).

Reference per-outer laps swing ~2x with host throttling on this box, so a
single point is not a committable claim.  This tool runs the full bench
(``python bench.py``, which since r5 measures a complete 10-outer reference
wall — no extrapolation — and anchors loss parity at the same full budget)
``BENCH_BAND_ROUNDS`` times (default 3), each round internally interleaving
the two legs A/B in one process, and reports median + min/max for the
speedup and the loss rel-diff.

Writes docs/measurements/bench_headline_r05.json.
Runtime: dominated by the reference legs (~30-50 min each on a 1-core
host); run unattended, nothing else competing for the host CPU.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

ROUNDS = int(os.environ.get("BENCH_BAND_ROUNDS", "3"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    runs = []
    for i in range(ROUNDS):
        t0 = time.perf_counter()
        print(f"[band] round {i + 1}/{ROUNDS}...", file=sys.stderr,
              flush=True)
        env = dict(os.environ)
        env.setdefault("BENCH_PARITY_OUTER", "10")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, cwd=REPO, env=env,
            timeout=3 * 3600)
        if proc.returncode != 0:
            print(proc.stderr[-3000:], file=sys.stderr)
            raise SystemExit(f"bench round {i + 1} failed")
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("{")][-1]
        result = json.loads(line)
        result["round_wall_s"] = round(time.perf_counter() - t0, 1)
        runs.append(result)
        print(f"[band] round {i + 1}: {result['value']}x, rel-diff "
              f"{result['detail']['loss_rel_diff']}", file=sys.stderr,
              flush=True)

    speedups = [r["value"] for r in runs]
    rels = [r["detail"]["loss_rel_diff"] for r in runs]
    t_refs = [r["detail"]["t_reference_s"] for r in runs]
    t_ours = [r["detail"]["t_ours_s"] for r in runs]
    out = {
        "metric": runs[0]["metric"],
        "rounds": ROUNDS,
        "speedup_median": float(np.median(speedups)),
        "speedup_min": float(np.min(speedups)),
        "speedup_max": float(np.max(speedups)),
        "loss_rel_diff_median": float(np.median(rels)),
        "loss_rel_diff_max": float(np.max(rels)),
        "t_reference_s": t_refs,
        "t_ours_s": t_ours,
        "methodology": "each round = one full `python bench.py` "
                       "(BENCH_PARITY_OUTER=10): a complete measured "
                       "10-outer reference run interleaved with ours in "
                       "one process; no extrapolation anywhere; loss "
                       "parity anchored at the full budget",
        "runs": runs,
    }
    path = os.path.join(REPO, "docs", "measurements",
                        "bench_headline_r05.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "runs"},
                     indent=1))


if __name__ == "__main__":
    main()
