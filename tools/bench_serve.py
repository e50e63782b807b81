"""Serving-path latency / throughput benchmark.

The reference has no serving stack (SURVEY.md §1); paule_tpu's HTTP service
(`paule_tpu/serve.py`) is a capability extension, so its performance gets
measured like any other hot path.  This tool stands up a warm server on a
loopback port (same harness as tests/test_serve.py) and measures, over real
HTTP round trips:

* /health            — control-plane latency floor
* /synthesize        — host C++ synthesis, T=201 and T=403 trajectories
* /embed             — jitted embedder on the accelerator
* /plan              — a small serving-sized planning budget
* /synthesize x4     — concurrent throughput (requests run on the
                       ThreadingHTTPServer's pool + the SynthPool lanes)

Writes one JSON blob to stdout (and optionally --out FILE) with p50/p95 per
endpoint.  Run on the intended serving host; numbers move with the
accelerator tunnel latency and host throttle like everything else measured
in docs/performance.md.
"""

import argparse
import concurrent.futures as cf
import json
import os
import statistics
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _post(url, payload, timeout=600):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def _get(url, timeout=60):
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        return json.loads(resp.read())


def _lat(fn, n, warmup=2):
    for _ in range(warmup):
        fn()
    xs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        xs.append((time.perf_counter() - t0) * 1e3)
    xs.sort()
    return {"p50_ms": round(statistics.median(xs), 2),
            "p95_ms": round(xs[min(len(xs) - 1, int(0.95 * len(xs)))], 2),
            "n": n}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--n", type=int, default=30, help="requests per metric")
    ap.add_argument("--plan-n", type=int, default=3)
    args = ap.parse_args()

    from paule_tpu import serve, synth
    from paule_tpu.api import Paule
    from paule_tpu.ops.normalize import inv_normalize_cp

    synth.initialize()
    service = serve.PauleService(Paule(seed=9))
    httpd = serve.make_server(service, "127.0.0.1", 0)
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    rng = np.random.default_rng(0)

    def cp_of(t):
        return np.clip(rng.normal(0, 0.05, (t, 30)).cumsum(0) * 0.2, -1, 1)

    cp201, cp403 = cp_of(201), cp_of(403)
    mel = rng.normal(0, 1, (100, 60)).astype(np.float32)
    sig, _sr = synth.speak(inv_normalize_cp(cp201))

    results = {"host": "loopback HTTP, ThreadingHTTPServer",
               "metrics": {}}
    m = results["metrics"]

    m["health"] = _lat(lambda: _get(base + "/health"), args.n)
    m["synthesize_T201"] = _lat(
        lambda: _post(base + "/synthesize",
                      {"cp": serve.encode_array(cp201), "normalized": True}),
        args.n)
    m["synthesize_T403"] = _lat(
        lambda: _post(base + "/synthesize",
                      {"cp": serve.encode_array(cp403), "normalized": True}),
        args.n)
    m["embed_F100"] = _lat(
        lambda: _post(base + "/embed", {"mel": serve.encode_array(mel)}),
        args.n)

    plan_payload = {"signal": serve.encode_array(sig), "sample_rate": 44100,
                    "n_outer": 2, "n_inner": 10, "log_ii": 5,
                    "continue_learning": False}
    m["plan_2x10"] = _lat(
        lambda: _post(base + "/plan", plan_payload), args.plan_n, warmup=1)

    # concurrent synthesis throughput: 4 client threads, n requests total
    def one():
        _post(base + "/synthesize",
              {"cp": serve.encode_array(cp201), "normalized": True})

    one()
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(4) as ex:
        list(ex.map(lambda _: one(), range(args.n)))
    dt = time.perf_counter() - t0
    m["synthesize_T201_concurrent4"] = {
        "req_per_s": round(args.n / dt, 1), "n": args.n}

    httpd.shutdown()
    out = json.dumps(results, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(out + "\n")


if __name__ == "__main__":
    main()
