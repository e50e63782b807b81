"""Benchmark: plan_resynth wall-clock per 1-second utterance, paule_tpu vs a
PyTorch-CPU reference-equivalent planning loop.

The reference (quantling/paule) publishes no numbers (BASELINE.md), so the
baseline is measured here: a torch float64 CPU implementation of the same
planning workload — ForwardModel (1-layer LSTM-720 + linear + avg-pool),
2-layer LSTM-720 embedder, the acoustic_semvec weighted loss with
velocity/jerk/local-linear regularizers, Adam on the trajectory, synthesis +
mel extraction every step (log_ii=1) — exactly the per-outer-iteration work
of the reference's default budget (n_inner=25, continue-learning 10 epochs x
3 batches of 8).  Both sides use the same host C++ synthesizer and the same
mel front-end, so the measured difference is the framework's compute path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
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


def bench_ours(target):
    from paule_tpu.api import Paule

    p = Paule(seed=1)
    kw = dict(target_acoustic=target, objective="acoustic_semvec",
              initialize_from="acoustic", log_ii=1, log_semantics=True,
              n_batches=N_BATCHES, batch_size=BATCH_SIZE, n_epochs=N_EPOCHS,
              continue_learning=True, verbose=False)
    # warmup: compile everything with the same shapes as the measured run
    p.plan_resynth(n_outer=1, n_inner=N_INNER, **kw)
    t0 = time.perf_counter()
    p.plan_resynth(n_outer=1, n_inner=N_INNER, **kw)
    return time.perf_counter() - t0


def bench_torch(target):
    """Reference-equivalent torch-f64 CPU planning loop (one outer iter)."""
    import torch

    from paule_tpu import synth
    from paule_tpu.dsp.mel import librosa_melspec
    from paule_tpu.ops.normalize import inv_normalize_cp, normalize_mel

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)

    class Fwd(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = torch.nn.LSTM(30, 720, num_layers=1, batch_first=True)
            self.lin = torch.nn.Linear(720, 60)
            self.pool = torch.nn.AvgPool1d(2, 2)

        def forward(self, x):
            h, _ = self.lstm(x)
            y = self.lin(h).permute(0, 2, 1)
            return self.pool(y).permute(0, 2, 1)

    class Emb(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = torch.nn.LSTM(60, 720, num_layers=2, batch_first=True)
            self.lin = torch.nn.Linear(720, 300)

        def forward(self, x):
            h, _ = self.lstm(x)
            return self.lin(h[:, -1, :])

    fwd = Fwd().double()
    emb = Emb().double()

    sig, sr = target
    tmel = normalize_mel(librosa_melspec(sig, sr))
    tmel = torch.from_numpy(tmel[None])
    tsem = torch.zeros(1, 300, dtype=torch.float64)

    def rmse(a, b):
        return torch.sqrt(torch.mean((a - b) ** 2))

    def d5(x):
        return (-x[:, 4:] + 8 * x[:, 3:-1] - 8 * x[:, 1:-3] + x[:, :-4]) / 12

    xx = torch.zeros(1, 2 * tmel.shape[1], 30, dtype=torch.float64,
                     requires_grad=True)
    opt = torch.optim.Adam([xx], lr=0.01)

    def one_step(log=True):
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
        if log:
            cps = xx[0].detach().numpy()
            s, r = synth.speak(inv_normalize_cp(cps))
            pmel = normalize_mel(librosa_melspec(s, r))
            _ = rmse(torch.from_numpy(pmel[None]), tmel)
            with torch.no_grad():
                _ = emb(torch.from_numpy(pmel[None]))
            result = pmel
        else:
            result = None
        opt.step()
        with torch.no_grad():
            xx.clamp_(-1.05, 1.05)
        return result

    one_step(log=False)  # warmup

    # measure a few steps and extrapolate linearly (per-step cost is
    # constant): median per-step time resists transient machine contention
    N_MEASURE = 5
    step_times = []
    prod_mels, cps_list = [], []
    for _ in range(N_MEASURE):
        t0 = time.perf_counter()
        pmel = one_step(log=True)
        step_times.append(time.perf_counter() - t0)
        prod_mels.append(pmel)
        cps_list.append(xx[0].detach().numpy().copy())
    t_plan = float(np.median(step_times)) * N_INNER

    f_opt = torch.optim.Adam(fwd.parameters(), lr=0.001)
    idx_pool = list(range(len(cps_list)))
    rng = np.random.default_rng(0)
    train_times = []
    for _ in range(N_MEASURE):
        idx = rng.choice(idx_pool, size=BATCH_SIZE)
        bi = torch.from_numpy(np.stack([cps_list[i] for i in idx]))
        bo = torch.from_numpy(np.stack([prod_mels[i] for i in idx]))
        t0 = time.perf_counter()
        f_opt.zero_grad()
        loss = rmse(fwd(bi), bo)
        loss.backward()
        f_opt.step()
        train_times.append(time.perf_counter() - t0)
    t_train = float(np.median(train_times)) * N_EPOCHS * N_BATCHES
    return t_plan + t_train


def main():
    target = make_target()
    t_torch = bench_torch(target)
    t_ours = bench_ours(target)
    speedup = t_torch / t_ours
    print(json.dumps({
        "metric": "plan_resynth wall-clock speedup per 1-s utterance "
                  "(25 inner steps + synthesis + continue-learning) vs "
                  "torch-f64-CPU reference-equivalent",
        "value": round(speedup, 2),
        "unit": "x",
        "vs_baseline": round(speedup, 2),
        "detail": {"t_ours_s": round(t_ours, 3),
                   "t_torch_cpu_s": round(t_torch, 3)},
    }))


if __name__ == "__main__":
    sys.exit(main())
