"""Benchmark: plan_resynth wall-clock AND final produced-mel-loss parity,
paule_tpu vs a PyTorch-f64-CPU reference-equivalent planning loop.

The reference (quantling/paule) publishes no numbers (BASELINE.md), so the
baseline is measured here: a torch float64 CPU implementation of the exact
planning workload — ForwardModel (1-layer LSTM-720 + linear + avg-pool),
2-layer LSTM-720 embedder, the acoustic_semvec weighted loss
(5*mel + 10*semvec + 80*velocity + 400*jerk + 100000*local-linear, reference
paule.py:592-599), Adam on the trajectory, synthesis + produced-loss logging
every step (log_ii=1, reference paule.py:1104-1115), and continue-learning
(10 epochs x 3 batches of 8 per outer iteration, paule.py:1244-1454).

Loss parity: BOTH sides run the SAME budget from the SAME initialization —
the torch models' state_dicts are converted (models/torch_convert, itself
parity-tested against the reference's classes) into our parameters, the
initial trajectory is zeros on both sides, and both report the final
produced mel loss (MEL_WEIGHT * RMSE(produced_mel, target_mel)).  Both sides
use the same host C++ synthesizer and mel front-end, so the measured
difference is the framework's compute path.

Timing: ours is measured hot at the full default budget (n_outer=10); the
torch side is measured over PARITY_OUTER full outer iterations (complete
inner loop + synthesis + continue-learning, no per-step sampling) and scaled
linearly to n_outer=10 (per-outer cost is constant by construction).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.

Env knobs: BENCH_PARITY_OUTER (default 2) bounds the torch wall-clock.
"""

import json
import os
import sys
import time

import numpy as np

N_INNER = 25
N_EPOCHS = 10
N_BATCHES = 3
BATCH_SIZE = 8
LR_PLANNING = 0.01
LR_LEARNING = 0.001
FULL_OUTER = 10
PARITY_OUTER = int(os.environ.get("BENCH_PARITY_OUTER", "2"))
SECONDS = 1.0
N_CP = int(round(SECONDS * 44100 / 110))  # 1 s of cp frames (~400)
if N_CP % 2:
    N_CP += 1


def make_target():
    from paule_tpu import synth
    from paule_tpu.ops.normalize import inv_normalize_cp

    synth.initialize()
    rng = np.random.default_rng(0)
    cp_true = np.clip(rng.normal(0, 0.05, (N_CP + 1, 30)).cumsum(0) * 0.2,
                      -1, 1)
    sig, sr = synth.speak(inv_normalize_cp(cp_true))
    return sig, sr


def make_torch_models():
    """Reference-architecture torch models (f64, seeded) whose state_dicts
    initialize BOTH sides."""
    import torch

    torch.manual_seed(0)

    class Fwd(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = torch.nn.LSTM(30, 720, num_layers=1, batch_first=True)
            self.post_linear = torch.nn.Linear(720, 60)
            self.pool = torch.nn.AvgPool1d(2, 2)

        def forward(self, x):
            h, _ = self.lstm(x)
            y = self.post_linear(h).permute(0, 2, 1)
            return self.pool(y).permute(0, 2, 1)

    class Emb(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = torch.nn.LSTM(60, 720, num_layers=2, batch_first=True)
            self.linear_mapping = torch.nn.Linear(720, 300)

        def forward(self, x):
            h, _ = self.lstm(x)
            return self.linear_mapping(h[:, -1, :])

    return Fwd().double(), Emb().double()


def convert_params(fwd, emb):
    from paule_tpu.models import torch_convert as TC

    return (TC.convert("forward", fwd.state_dict()),
            TC.convert("embedder", emb.state_dict()))


def bench_torch(target, fwd, emb, n_outer):
    """Faithful torch-f64-CPU planning loop at full fidelity: n_outer outer
    iterations of [n_inner planning steps with synthesis each step] +
    continue-learning.  Returns (wall_seconds, prod_losses)."""
    import random

    import torch

    from paule_tpu import synth
    from paule_tpu.dsp.mel import librosa_melspec
    from paule_tpu.ops.normalize import inv_normalize_cp, normalize_mel

    torch.set_num_threads(os.cpu_count() or 1)
    py_rng = random.Random(1)

    sig, sr = target
    tmel = np.asarray(normalize_mel(librosa_melspec(sig, sr)),
                      dtype=np.float64)
    tmel -= tmel.min()  # reference paule.py:527 (produced mel stays unshifted)
    tmel = torch.from_numpy(tmel[None])
    with torch.no_grad():
        tsem = emb(tmel)

    def rmse(a, b):
        return torch.sqrt(torch.mean((a - b) ** 2))

    def d5(x):
        return (-x[:, 4:] + 8 * x[:, 3:-1] - 8 * x[:, 1:-3] + x[:, :-4]) / 12

    xx = torch.zeros(1, 2 * tmel.shape[1], 30, dtype=torch.float64,
                     requires_grad=True)
    opt = torch.optim.Adam([xx], lr=LR_PLANNING)
    f_opt = torch.optim.Adam(fwd.parameters(), lr=LR_LEARNING)

    prod_losses = []
    t0 = time.perf_counter()
    for _outer in range(n_outer):
        snapshots_cp, snapshots_mel = [], []
        for _inner in range(N_INNER):
            opt.zero_grad()
            pm = fwd(xx)
            ps = emb(pm)
            vel = d5(xx)
            jerk = d5(d5(vel))
            ll = (2 * xx[:, 1:-1] - xx[:, :-2] - xx[:, 2:]) / 2
            loss = (5.0 * rmse(pm, tmel) + 10.0 * rmse(ps, tsem)
                    + 80.0 * torch.mean(vel**2) + 400.0 * torch.mean(jerk**2)
                    + 100_000.0 * torch.mean(ll**2))
            loss.backward()
            # snapshot BEFORE the update (reference paule.py:1065-1115)
            cps = xx[0].detach().numpy().copy()
            s, r = synth.speak(inv_normalize_cp(cps))
            pmel = np.asarray(normalize_mel(librosa_melspec(s, r)),
                              dtype=np.float64)
            prod_losses.append(5.0 * float(
                rmse(torch.from_numpy(pmel[None]), tmel)))
            with torch.no_grad():
                _ = emb(torch.from_numpy(pmel[None]))  # prod semvec logging
            snapshots_cp.append(cps)
            snapshots_mel.append(pmel)
            opt.step()
            with torch.no_grad():
                xx.clamp_(-1.05, 1.05)

        # continue-learning (reference paule.py:1244-1454): sample
        # batch_size*n_batches snapshots, same-size batching, n_epochs
        want = BATCH_SIZE * N_BATCHES
        k = min(want, len(snapshots_cp))
        idx = py_rng.sample(range(len(snapshots_cp)), k)
        cps_all = torch.from_numpy(np.stack([snapshots_cp[i] for i in idx]))
        mels_all = torch.from_numpy(np.stack([snapshots_mel[i] for i in idx]))
        for _ep in range(N_EPOCHS):
            order = list(range(k))
            py_rng.shuffle(order)
            for b in range(k // BATCH_SIZE):
                bidx = order[b * BATCH_SIZE:(b + 1) * BATCH_SIZE]
                f_opt.zero_grad()
                tr_loss = rmse(fwd(cps_all[bidx]), mels_all[bidx])
                tr_loss.backward()
                f_opt.step()
    return time.perf_counter() - t0, prod_losses


def make_paule(params_fwd, params_emb):
    from paule_tpu.api import Paule

    return Paule(seed=1, pred_model=params_fwd, embedder=params_emb)


def run_ours(p, target, init_cp, n_outer):
    r = p.plan_resynth(
        target_acoustic=target, objective="acoustic_semvec",
        initial_cp=init_cp, initialize_from=None, log_ii=1,
        log_semantics=True, learning_rate_planning=LR_PLANNING,
        learning_rate_learning=LR_LEARNING, n_outer=n_outer, n_inner=N_INNER,
        n_batches=N_BATCHES, batch_size=BATCH_SIZE, n_epochs=N_EPOCHS,
        continue_learning=True, verbose=False)
    return r


def main():
    target = make_target()
    # stage markers on stderr: if the driver's timeout kills the run (e.g.
    # during a TPU-tunnel outage), the captured tail shows where it died
    def stage(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    fwd, emb = make_torch_models()
    params_fwd, params_emb = convert_params(fwd, emb)

    from paule_tpu.dsp.mel import librosa_melspec
    from paule_tpu.ops.normalize import normalize_mel

    n_mel = np.asarray(normalize_mel(
        librosa_melspec(target[0], target[1]))).shape[0]
    init_cp = np.zeros((2 * n_mel, 30))
    stage("target + converted weights ready")

    # ---- loss parity: same budget, same init, both sides measured fully ----
    p = make_paule(params_fwd, params_emb)
    stage(f"parity run (ours, n_outer={PARITY_OUTER}, cold compiles)...")
    r_parity = run_ours(p, target, init_cp, PARITY_OUTER)  # cold (compiles)
    loss_ours = float(r_parity.prod_loss_steps[-1])

    stage(f"torch-f64-CPU leg ({PARITY_OUTER} outer iterations, ~200 s "
          "each on a 1-core host)...")
    t_torch_parity, torch_losses = bench_torch(target, fwd, emb, PARITY_OUTER)
    loss_torch = float(torch_losses[-1])

    # ---- timing at the full default budget (n_outer=10) ----
    stage("timing run (ours, full default budget)...")
    p3 = make_paule(params_fwd, params_emb)  # fresh weights
    run_ours(p3, target, init_cp, 1)  # warm this instance's compiles
    t0 = time.perf_counter()
    run_ours(p3, target, init_cp, FULL_OUTER)
    t_ours_full = time.perf_counter() - t0
    t_torch_full = t_torch_parity * (FULL_OUTER / PARITY_OUTER)

    speedup = t_torch_full / t_ours_full
    rel = abs(loss_ours - loss_torch) / max(abs(loss_torch), 1e-9)
    print(json.dumps({
        "metric": "plan_resynth speedup at the reference default budget "
                  "(10 outer x 25 inner, synthesis every step, "
                  "continue-learning) vs torch-f64-CPU reference-equivalent, "
                  "at matching final produced-mel loss",
        "value": round(speedup, 2),
        "unit": "x",
        "vs_baseline": round(speedup, 2),
        "detail": {
            "t_ours_s": round(t_ours_full, 3),
            "t_torch_cpu_s": round(t_torch_full, 3),
            "t_torch_measured_s": round(t_torch_parity, 3),
            "torch_timing": f"measured over {PARITY_OUTER} full outer "
                            f"iterations, scaled x{FULL_OUTER}/{PARITY_OUTER}",
            "loss_ours": round(loss_ours, 4),
            "loss_torch": round(loss_torch, 4),
            "loss_rel_diff": round(rel, 4),
            "loss_parity_ok": bool(rel <= 0.10),
            "loss_parity_budget_n_outer": PARITY_OUTER,
            "loss_semantics": "MEL_WEIGHT * RMSE(produced mel, target mel), "
                              "final logged step; both sides same converted "
                              "init weights, same zero initial trajectory, "
                              "same synthesizer + mel front-end",
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
