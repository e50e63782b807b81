"""Batched-planning throughput scaling over batch size.

r4's natively-batched criterion made B=8 planning cost ~the B=1 wall
(roofline_r04.json).  This tool maps the whole curve: per-inner-step wall
(slope of wall(n_steps) over {5,25,50} hot runs — the roofline's
discipline, so tunnel dispatch intercepts cancel) and utterance-step
throughput for B in {1, 2, 4, 8, 16, 32} at the bench shape (T=402,
H=720, acoustic_semvec).  The knee of this curve is the right
`batch_size` for corpus planning on one chip; a dp mesh multiplies it.

Writes docs/measurements/batch_scaling_r04.json.
Run on the real TPU with a QUIET host: PYTHONPATH=. python tools/batch_scaling.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from roofline import measure_planning_step  # noqa: E402

BATCHES = (1, 2, 4, 8, 16, 32)
OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "measurements",
                   "batch_scaling_r04.json")


def main():
    import jax

    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"SKIP: backend is {backend!r}, need a real TPU")
        return 1

    rows = {}
    base = None
    for b in BATCHES:
        slope = measure_planning_step(b)
        if base is None:
            base = slope
        rows[f"B{b}"] = {
            "per_inner_step_ms": round(slope * 1e3, 3),
            "wall_vs_B1": round(slope / base, 2),
            "utterance_steps_per_s": round(b / slope, 1),
            "throughput_vs_B1": round((b / slope) / (1 / base), 2),
        }
        print(f"B={b}: {slope * 1e3:.2f} ms/step, "
              f"{b / slope:.0f} utt-steps/s "
              f"({(b / slope) / (1 / base):.1f}x B=1)", file=sys.stderr,
              flush=True)

    out = {
        "backend": backend,
        "shape": "T=402 cp frames (1 s), H=720, acoustic_semvec, log_ii=1",
        "method": "per-inner-step wall = slope of hot wall(n_steps) over "
                  "n_steps in {5,25,50} (min of 8 reps each, forced "
                  "scalar fetch) — tunnel dispatch intercept cancels; "
                  "B=1 runs engine.plan_segment, B>1 "
                  "parallel.batched.plan_segment_batched (natively "
                  "batched criterion)",
        "batches": rows,
    }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
