"""Client for the paule_tpu HTTP service (paule_tpu/serve.py).

Start the server first (it binds immediately; /health says "warming" until
the XLA programs are compiled, then "ok"):

    python -m paule_tpu.serve --port 8750 --warmup-lengths 200,400

then run this script.  Arrays travel as base64-encoded little-endian
float32/float64 with an explicit shape (see serve.encode_array).
"""

import base64
import json
import sys
import time
import urllib.request

import numpy as np

BASE = "http://127.0.0.1:8750"


def encode(a, dtype="<f8"):
    a = np.asarray(a, dtype=dtype)
    tag = "float64" if dtype == "<f8" else "float32"
    return {"b64": base64.b64encode(a.tobytes()).decode(),
            "shape": list(a.shape), "dtype": tag}


def decode(obj):
    dt = {"float32": "<f4", "float64": "<f8"}[obj.get("dtype", "float32")]
    return np.frombuffer(base64.b64decode(obj["b64"]),
                         dtype=dt).reshape(obj["shape"])


def get(path):
    with urllib.request.urlopen(BASE + path, timeout=60) as resp:
        return json.loads(resp.read())


def post(path, payload, timeout=600):
    req = urllib.request.Request(
        BASE + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


# 1) wait for the server to finish warming (503s / "warming" until then)
while True:
    health = get("/health")
    if health["status"] == "ok":
        break
    if health["status"] == "error":
        sys.exit(f"server startup failed: {health.get('error')}")
    print("server warming, waiting...")
    time.sleep(5)
print("server:", health)

# 2) synthesize audio for a (normalized) cp trajectory
rng = np.random.default_rng(0)
cp = np.clip(rng.normal(0, 0.1, (200, 30)).cumsum(0) * 0.1, -1, 1)
out = post("/synthesize", {"cp": encode(cp), "normalized": True})
audio = decode(out["audio"])
print(f"synthesized {audio.shape[0]} samples at {out['sample_rate']} Hz")

# 3) plan a trajectory for that audio (copy synthesis)
plan = post("/plan", {
    "signal": encode(audio), "sample_rate": out["sample_rate"],
    "objective": "acoustic", "n_outer": 2, "n_inner": 10, "log_ii": 5,
    "continue_learning": False})
planned_cp = decode(plan["planned_cp"])
print(f"planned cp {planned_cp.shape}; produced-mel losses "
      f"{[round(x, 3) for x in plan['prod_loss_steps']]}")

# 4) plan several utterances data-parallel
batch = post("/plan_batch", {
    "signals": [encode(audio), encode(audio)], "sample_rate": 44100,
    "objective": "acoustic", "n_outer": 1, "n_inner": 5,
    "continue_learning": False})
print(f"batch planned {len(batch['results'])} utterances; final losses "
      f"{[round(r['prod_loss_curve'][-1], 3) for r in batch['results']]}")
