"""HTTP serving: health, synthesis, embedding and planning endpoints over a
live ThreadingHTTPServer (loopback), including error handling."""

import json
import threading
import urllib.request
import urllib.error

import numpy as np
import pytest

from paule_tpu import serve, synth
from paule_tpu.api import Paule
from paule_tpu.ops.normalize import inv_normalize_cp, normalize_cp


@pytest.fixture(scope="module")
def stack():
    synth.initialize()
    service = serve.PauleService(Paule(seed=9))
    httpd = serve.make_server(service, "127.0.0.1", 0)  # ephemeral port
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}", service
    httpd.shutdown()


@pytest.fixture(scope="module")
def server(stack):
    return stack[0]


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as resp:
        return json.loads(resp.read())


def test_health(server):
    with urllib.request.urlopen(server + "/health", timeout=60) as resp:
        body = json.loads(resp.read())
    assert body["status"] == "ok"
    assert body["n_devices"] >= 1


def test_synthesize_roundtrip(server):
    rng = np.random.default_rng(0)
    cp = np.clip(rng.normal(0, 0.1, (40, 30)).cumsum(0) * 0.1, -1, 1)
    body = _post(server + "/synthesize",
                 {"cp": serve.encode_array(cp), "normalized": True})
    audio = serve.decode_array(body["audio"])
    assert body["sample_rate"] == 44100
    assert audio.shape == (39 * 110,)
    # matches a direct pool call
    ref, _ = synth.speak(inv_normalize_cp(cp))
    np.testing.assert_allclose(audio, ref, atol=1e-4)


def test_embed(server):
    mel = np.zeros((20, 60))
    body = _post(server + "/embed", {"mel": mel.tolist()})
    semvec = serve.decode_array(body["semvec"])
    assert semvec.shape == (300,)


def test_plan(server):
    rng = np.random.default_rng(1)
    cp = np.clip(rng.normal(0, 0.1, (40, 30)).cumsum(0) * 0.1, -1, 1)
    sig, sr = synth.speak(inv_normalize_cp(cp))
    body = _post(server + "/plan",
                 {"signal": serve.encode_array(sig), "sample_rate": sr,
                  "objective": "acoustic", "n_outer": 1, "n_inner": 2,
                  "log_ii": 1, "n_batches": 1, "batch_size": 2,
                  "n_epochs": 1})
    planned = serve.decode_array(body["planned_cp"])
    assert planned.shape[1] == 30
    assert len(body["prod_loss_steps"]) == 2
    assert all(np.isfinite(body["prod_loss_steps"]))


def test_bad_request(server):
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(server + "/synthesize", {"wrong_key": 1})
    assert err.value.code == 400


def test_unknown_path(server):
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(server + "/nope", {})
    assert err.value.code == 404


def test_bad_dtype_rejected(server):
    import base64
    arr = np.zeros((4, 30), dtype="<i4")
    payload = {"cp": {"b64": base64.b64encode(arr.tobytes()).decode(),
                      "shape": [4, 30], "dtype": "int32"}}
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(server + "/synthesize", payload)
    assert err.value.code == 400


def test_unknown_plan_key_rejected(server):
    sig = np.zeros(4400)
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(server + "/plan",
              {"signal": serve.encode_array(sig), "sample_rate": 44100,
               "n_outter": 50})
    assert err.value.code == 400
    assert "n_outter" in err.value.read().decode()


def test_plan_batch(server):
    from paule_tpu import synth
    from paule_tpu.ops.normalize import inv_normalize_cp
    from paule_tpu.serve import encode_array

    synth.initialize()
    rng = np.random.default_rng(2)
    sigs = []
    for n_cp in (16, 20):
        cp = np.clip(rng.normal(0, 0.1, (n_cp, 30)).cumsum(0) * 0.1, -1, 1)
        sig, _sr = synth.speak(inv_normalize_cp(cp))
        sigs.append(sig)
    body = _post(server + "/plan_batch", {
        "signals": [encode_array(s) for s in sigs], "sample_rate": 44100,
        "objective": "acoustic", "n_outer": 1, "n_inner": 2,
        "continue_learning": False})
    assert len(body["results"]) == 2
    for r, n_cp in zip(body["results"], (16, 20)):
        assert np.isfinite(r["prod_loss_curve"]).all()
        cp_shape = np.asarray(r["planned_cp"]["shape"])
        assert tuple(cp_shape) == (n_cp, 30)

    err = None
    try:
        _post(server + "/plan_batch", {
            "signals": [encode_array(sigs[0])], "bogus": 1})
    except Exception as exc:  # urllib raises on 400
        err = exc
    assert err is not None


def test_warming_state():
    """While warmup compiles, the port is already bound, /health reports
    "warming" and compute endpoints 503 so orchestrators retry instead of
    timing out; both recover once ready is set.  The gate only reads the
    ready event, so a stub model suffices."""
    import urllib.error

    service = serve.PauleService(object())
    service.ready.clear()
    httpd = serve.make_server(service, "127.0.0.1", 0)
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(url + "/health", timeout=60) as resp:
            assert json.loads(resp.read())["status"] == "warming"
        try:
            _post(url + "/synthesize", {"cp": []})
            raise AssertionError("expected 503 while warming")
        except urllib.error.HTTPError as exc:
            assert exc.code == 503
        service.ready.set()
        with urllib.request.urlopen(url + "/health", timeout=60) as resp:
            assert json.loads(resp.read())["status"] == "ok"

        # startup failure: /health reports "error" + detail, compute 503s
        service.startup_error = RuntimeError("weights not found")
        with urllib.request.urlopen(url + "/health", timeout=60) as resp:
            body = json.loads(resp.read())
        assert body["status"] == "error"
        assert "weights not found" in body["error"]
        try:
            _post(url + "/synthesize", {"cp": []})
            raise AssertionError("expected 503 after startup failure")
        except urllib.error.HTTPError as exc:
            assert exc.code == 503
            assert "startup failed" in json.loads(exc.read())["error"]
    finally:
        httpd.shutdown()


def test_warmup_restores_model_state():
    """The warmup plans train on noise; the served model must come out
    bit-identical to the loaded one (weights, optimizer state, replay
    buffer, rng)."""
    import jax

    from paule_tpu import checkpoint

    synth.initialize()
    model = Paule(seed=11)
    before = checkpoint.to_host(checkpoint.paule_state(model))
    serve._warmup(model, cp_lengths=(20,))
    after = checkpoint.to_host(checkpoint.paule_state(model))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        {k: v for k, v in before.items() if k != "continue_data"},
        {k: v for k, v in after.items() if k != "continue_data"})
    assert (after["continue_data"] is None) == \
        (before["continue_data"] is None)


def test_concurrent_synthesize(server):
    """Concurrent /synthesize requests must all succeed with results
    identical to serial calls (the handle pool + threaded HTTP server are
    the race-safety story vs the reference's global VTL singleton)."""
    import concurrent.futures

    rng = np.random.default_rng(5)
    cps = [np.clip(rng.normal(0, 0.1, (24, 30)).cumsum(0) * 0.1, -1, 1)
           for _ in range(8)]
    serial = [synth.speak(inv_normalize_cp(cp))[0] for cp in cps]

    def call(cp):
        body = _post(server + "/synthesize",
                     {"cp": serve.encode_array(cp), "normalized": True})
        return serve.decode_array(body["audio"])

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        outs = list(ex.map(call, cps))
    for out, ref in zip(outs, serial):
        np.testing.assert_allclose(out, ref, atol=1e-4)


def test_oversized_request_413(stack):
    url, service = stack
    old = service.MAX_REQUEST_BYTES
    service.MAX_REQUEST_BYTES = 100
    try:
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(url + "/embed", {"mel": [[0.0] * 60] * 20})
        assert err.value.code == 413
        assert "limit" in json.loads(err.value.read())["error"]
    finally:
        service.MAX_REQUEST_BYTES = old


def test_oversized_request_413_large_body(stack):
    """A body far past socket-buffer size still yields a readable 413.

    The handler must drain the unread upload before the socket closes —
    otherwise the close RSTs the still-writing client and the 413 bytes
    are discarded (client sees ConnectionResetError, not the JSON error).
    """
    url, service = stack
    old = service.MAX_REQUEST_BYTES
    service.MAX_REQUEST_BYTES = 1 << 16  # 64 KB limit
    try:
        body = b'{"mel": "' + b"A" * (8 << 20) + b'"}'  # 8 MB upload
        req = urllib.request.Request(
            url + "/embed", data=body,
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req, timeout=30)
        assert err.value.code == 413
        assert "limit" in json.loads(err.value.read())["error"]
    finally:
        service.MAX_REQUEST_BYTES = old


def test_plan_queue_full_429(stack):
    url, service = stack
    old = service.PLAN_QUEUE_LIMIT
    service.PLAN_QUEUE_LIMIT = 0
    try:
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(url + "/plan", {"signal": [0.0] * 2200, "n_outer": 1,
                                  "n_inner": 1})
        assert err.value.code == 429
        assert err.value.headers["Retry-After"]
        assert "queue full" in json.loads(err.value.read())["error"]
    finally:
        service.PLAN_QUEUE_LIMIT = old


def test_plan_lock_wait_timeout_429(stack):
    url, service = stack
    old_t = service.PLAN_WAIT_TIMEOUT_S
    service.PLAN_WAIT_TIMEOUT_S = 0.05
    service._plan_lock.acquire()  # simulate a long-running plan
    try:
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(url + "/plan", {"signal": [0.0] * 2200, "n_outer": 1,
                                  "n_inner": 1})
        assert err.value.code == 429
        assert "timed out" in json.loads(err.value.read())["error"]
    finally:
        service._plan_lock.release()
        service.PLAN_WAIT_TIMEOUT_S = old_t


def test_warmup_watchdog(monkeypatch):
    """A warmup that outlives the watchdog deadline flips the service to
    the error state (a wedged accelerator tunnel hangs warmup RPCs
    forever); a LATE completion clears the watchdog's error and serves.
    Only the state machine is under test — _warmup is stubbed."""
    import time

    release = threading.Event()
    monkeypatch.setattr(serve, "_warmup",
                        lambda model, lengths: release.wait(30))
    service = serve.PauleService(object())
    serve.start_warmup(service, (40,), warmup_timeout=0.2)

    deadline = time.time() + 10
    while service.startup_error is None and time.time() < deadline:
        time.sleep(0.02)
    assert isinstance(service.startup_error, serve.WarmupTimeout)
    assert not service.ready.is_set()

    release.set()  # the wedge clears; warmup completes late
    deadline = time.time() + 10
    while not service.ready.is_set() and time.time() < deadline:
        time.sleep(0.02)
    assert service.ready.is_set()
    assert service.startup_error is None


def test_warmup_no_watchdog_by_default_disable(monkeypatch):
    """warmup_timeout=0/None disables the watchdog: a slow warmup stays in
    the 'warming' state (no error) until it completes."""
    import time

    release = threading.Event()
    monkeypatch.setattr(serve, "_warmup",
                        lambda model, lengths: release.wait(30))
    service = serve.PauleService(object())
    serve.start_warmup(service, (40,), warmup_timeout=0)
    time.sleep(0.4)
    assert service.startup_error is None and not service.ready.is_set()
    release.set()
    deadline = time.time() + 10
    while not service.ready.is_set() and time.time() < deadline:
        time.sleep(0.02)
    assert service.ready.is_set() and service.startup_error is None


def test_synthesize_rejects_non_finite_cp(server):
    cp = np.zeros((10, 30))
    cp[3, 5] = np.nan
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server + "/synthesize",
              {"cp": serve.encode_array(cp), "normalized": False})
    assert e.value.code == 400
    assert "non-finite" in e.value.read().decode()
