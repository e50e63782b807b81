"""On-TPU validation + measurement of the fused Pallas LSTM kernel.

The CPU test suite exercises the kernels only in the Pallas interpreter
(`tests/test_pallas_lstm.py`); a Mosaic-level miscompile would ship
silently.  This script runs on the REAL device (backend 'tpu'/'axon'):

1. asserts pallas-vs-scan numerics on-device (forward and gradients) at the
   planning shapes, and
2. re-measures the fwd / fwd+bwd speedup at (B=1, T=402, H=720) and
   (B=8, T=402, H=720),

then writes the measurement artifact ``docs/measurements/pallas_r{N}.json``.

Run: PYTHONPATH=. python tools/pallas_on_device.py [--out FILE]
"""

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/measurements/pallas_r03.json")
    ap.add_argument("--repeats", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"SKIP: backend is {backend!r}, need a real TPU")
        return 1

    os.environ["PAULE_TPU_PALLAS"] = "0"  # force-scan baseline module state
    from paule_tpu.ops import lstm as lstm_mod
    from paule_tpu.ops.lstm import lstm_layer_params
    from paule_tpu.ops.pallas_lstm import lstm_layer_pallas

    rng = jax.random.PRNGKey(0)
    results = {"backend": backend, "device": str(jax.devices()[0]),
               "hidden": 720, "seq": 402, "cases": {}}

    def scan_layer(params, x):
        # the lax.scan implementation, bypassing the pallas gate
        assert not lstm_mod.pallas_enabled()
        return lstm_mod.lstm_layer(params, x)

    # (B=1/8, T=402, IN=30): the planning forward-model shapes;
    # (B=25, T=203, IN=60): the metrics embedder over one outer iteration's
    # 25 logged snapshots — the shape that OOMed scoped VMEM before
    # _pick_chunk accounted for the batch-scaled kernel stack
    for batch, T, IN in ((1, 402, 30), (8, 402, 30), (25, 203, 60)):
        H = 720
        kp, kx = jax.random.split(jax.random.fold_in(rng, batch))
        params = lstm_layer_params(kp, IN, H, jnp.float32)
        x = jax.random.normal(kx, (batch, T, IN), jnp.float32)

        f_scan = jax.jit(lambda p, x: scan_layer(p, x)[0])
        f_pal = jax.jit(lambda p, x: lstm_layer_pallas(p, x, None, None)[0])
        g_scan = jax.jit(jax.grad(
            lambda p, x: (scan_layer(p, x)[0] ** 2).mean(), argnums=(0, 1)))
        g_pal = jax.jit(jax.grad(
            lambda p, x: (lstm_layer_pallas(p, x, None, None)[0] ** 2).mean(),
            argnums=(0, 1)))

        # ---- numerics on the real device ----
        y_s = jax.device_get(f_scan(params, x))
        y_p = jax.device_get(f_pal(params, x))
        fwd_err = float(np.max(np.abs(y_s - y_p)) /
                        max(np.max(np.abs(y_s)), 1e-9))
        gs = jax.device_get(g_scan(params, x))
        gp = jax.device_get(g_pal(params, x))
        flat_s = jax.tree.leaves(gs)
        flat_p = jax.tree.leaves(gp)
        grad_err = max(
            float(np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-9))
            for a, b in zip(flat_s, flat_p))
        ok = fwd_err < 5e-3 and grad_err < 5e-2  # f32 accum differences
        print(f"B={batch}: fwd rel err {fwd_err:.2e}, "
              f"grad rel err {grad_err:.2e} -> {'OK' if ok else 'FAIL'}")

        # ---- timing ----
        # per-call (incl. the ~20 ms tunnel sync — the latency a single
        # blocking call pays) and amortized (N async dispatches, ONE final
        # block — the true device time when calls pipeline, as they do
        # inside the planning loop)
        def t_med(fn, *a):
            jax.block_until_ready(fn(*a))  # warm
            ts = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(*a))
                ts.append(time.perf_counter() - t0)
            return statistics.median(ts)

        def t_amort(fn, *a, n=20):
            jax.block_until_ready(fn(*a))  # warm
            t0 = time.perf_counter()
            outs = [fn(*a) for _ in range(n)]
            jax.block_until_ready(outs)
            return (time.perf_counter() - t0) / n

        t_fs = t_med(f_scan, params, x)
        t_fp = t_med(f_pal, params, x)
        t_gs = t_med(g_scan, params, x)
        t_gp = t_med(g_pal, params, x)
        a_fs = t_amort(f_scan, params, x)
        a_fp = t_amort(f_pal, params, x)
        a_gs = t_amort(g_scan, params, x)
        a_gp = t_amort(g_pal, params, x)
        print(f"B={batch}: fwd scan {1e3 * t_fs:.2f} ms vs pallas "
              f"{1e3 * t_fp:.2f} ms ({t_fs / t_fp:.2f}x); fwd+bwd "
              f"{1e3 * t_gs:.2f} vs {1e3 * t_gp:.2f} ms "
              f"({t_gs / t_gp:.2f}x)")
        print(f"B={batch} amortized: fwd {1e3 * a_fs:.2f} vs "
              f"{1e3 * a_fp:.2f} ms ({a_fs / a_fp:.2f}x); fwd+bwd "
              f"{1e3 * a_gs:.2f} vs {1e3 * a_gp:.2f} ms "
              f"({a_gs / a_gp:.2f}x)")
        results["cases"][f"B{batch}"] = {
            "numerics_ok": bool(ok),
            "fwd_rel_err": fwd_err, "grad_rel_err": grad_err,
            "fwd_scan_ms": round(1e3 * t_fs, 3),
            "fwd_pallas_ms": round(1e3 * t_fp, 3),
            "fwd_speedup": round(t_fs / t_fp, 2),
            "fwdbwd_scan_ms": round(1e3 * t_gs, 3),
            "fwdbwd_pallas_ms": round(1e3 * t_gp, 3),
            "fwdbwd_speedup": round(t_gs / t_gp, 2),
            "amortized": {
                "fwd_scan_ms": round(1e3 * a_fs, 3),
                "fwd_pallas_ms": round(1e3 * a_fp, 3),
                "fwd_speedup": round(a_fs / a_fp, 2),
                "fwdbwd_scan_ms": round(1e3 * a_gs, 3),
                "fwdbwd_pallas_ms": round(1e3 * a_gp, 3),
                "fwdbwd_speedup": round(a_gs / a_gp, 2),
                "note": "20 async dispatches, one final block — device "
                        "time with the ~20 ms tunnel sync amortized away",
            },
        }

    all_ok = all(c["numerics_ok"] for c in results["cases"].values())
    results["all_numerics_ok"] = bool(all_ok)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {args.out}")
    return 0 if all_ok else 2


if __name__ == "__main__":
    sys.exit(main())
