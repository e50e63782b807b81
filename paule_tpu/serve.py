"""HTTP serving for planning and synthesis.

The reference has no serving stack (SURVEY.md §1: "no CLI, no serving
stack"); this module makes the framework deployable: a threaded JSON/HTTP
server around a warm :class:`paule_tpu.api.Paule` instance.

* planning requests serialize on the model lock (planning mutates the
  continue-learning state); synthesis and embedding requests run
  concurrently (the C++ ``SynthPool`` and jitted model calls are
  thread-safe);
* arrays travel as base64-encoded little-endian float32 with an explicit
  shape, or as plain nested JSON lists;
* start with ``python -m paule_tpu.serve --port 8750`` or programmatically
  via :func:`serve`.

Endpoints
---------
GET  /health       -> {"status": "ok"|"warming"|"error", "backend": ...,
                       "version": ...}; "warming" while the model builds /
                       warmup compiles (retry), "error" (+ "error" detail)
                       if startup failed
POST /synthesize   {"cp": <array (T,30)>, "normalized": true}
                   -> {"audio": <array>, "sample_rate": 44100}
POST /embed        {"mel": <array (F,60)>} -> {"semvec": <array (300,)>}
POST /plan         {"signal": <array>, "sample_rate": int, ...plan kwargs}
                   -> planned trajectory, losses, produced audio
POST /plan_batch   {"signals": [<array>, ...], "sample_rate": int,
                    "max_batch": int, ...plan kwargs}
                   -> {"results": [per-utterance planned cp/audio/losses]}

All POST endpoints return 503 (with a retry hint) while warming and while
startup is failed.  Robustness limits: request bodies above
``PauleService.MAX_REQUEST_BYTES`` (64 MB default) are rejected with 413
before being read; planning requests beyond a bounded queue
(``PLAN_QUEUE_LIMIT``, default 4 waiting) or whose lock wait exceeds
``PLAN_WAIT_TIMEOUT_S`` get 429 with a Retry-After header; a warmup still
running after ``warmup_timeout`` seconds (wedged accelerator tunnel) flips
/health to "error" instead of reporting "warming" forever.
"""

import base64
import contextlib
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class ServiceBusy(Exception):
    """Raised when the planning queue is full or the wait timed out; the
    HTTP layer maps it to 429 with a Retry-After hint."""


def encode_array(arr):
    arr = np.asarray(arr, dtype=np.float32)
    return {"b64": base64.b64encode(arr.astype("<f4").tobytes()).decode(),
            "shape": list(arr.shape), "dtype": "float32"}


_DTYPES = {"float32": "<f4", "float64": "<f8"}


def decode_array(obj):
    if isinstance(obj, dict) and "b64" in obj:
        tag = obj.get("dtype", "float32")
        if tag not in _DTYPES:
            raise ValueError(
                f"unsupported array dtype {tag!r}; use one of "
                f"{sorted(_DTYPES)}")
        arr = np.frombuffer(base64.b64decode(obj["b64"]),
                            dtype=_DTYPES[tag])
        return arr.reshape(obj["shape"]).astype(np.float64)
    return np.asarray(obj, dtype=np.float64)


class PauleService:
    """The request handlers, separated from HTTP plumbing for testability."""

    #: request bodies above this are rejected with 413 before being read
    MAX_REQUEST_BYTES = 64 << 20
    #: requests allowed to WAIT on the plan lock (on top of the running
    #: one); beyond this the service answers 429 immediately
    PLAN_QUEUE_LIMIT = 4
    #: max seconds a queued plan request waits for the lock before 429
    PLAN_WAIT_TIMEOUT_S = 300.0

    def __init__(self, paule_model=None, defer_model=False,
                 max_request_bytes=None, plan_queue_limit=None,
                 plan_wait_timeout_s=None, **paule_kwargs):
        self._paule_kwargs = paule_kwargs
        self._plan_lock = threading.Lock()
        self._waiters_lock = threading.Lock()
        self._plan_waiters = 0
        if max_request_bytes is not None:
            self.MAX_REQUEST_BYTES = int(max_request_bytes)
        if plan_queue_limit is not None:
            self.PLAN_QUEUE_LIMIT = int(plan_queue_limit)
        if plan_wait_timeout_s is not None:
            self.PLAN_WAIT_TIMEOUT_S = float(plan_wait_timeout_s)
        #: cleared while the model constructs / the warmup planning call
        #: compiles XLA programs; /health reports "warming" and the compute
        #: endpoints 503 so load balancers retry instead of timing out
        #: (remote compilation can take minutes on a cold cache)
        self.ready = threading.Event()
        #: set to the exception when background model build / warmup fails;
        #: /health then reports "error" instead of silently looking ok
        self.startup_error = None
        self.model = paule_model
        if paule_model is None and not defer_model:
            self._build_model()
        if self.model is not None:
            self.ready.set()

    def _build_model(self):
        from .api import Paule

        self.model = Paule(**self._paule_kwargs)

    @contextlib.contextmanager
    def _plan_slot(self):
        """Bounded admission to the (exclusive) planning lock.

        A running plan holds the lock for its full duration — planning is
        minutes-long by design — so uncontrolled callers would pile up
        threads indefinitely.  At most PLAN_QUEUE_LIMIT requests may wait,
        each for at most PLAN_WAIT_TIMEOUT_S; everything beyond that gets
        :class:`ServiceBusy` (HTTP 429) so clients back off instead of
        hanging."""
        with self._waiters_lock:
            if self._plan_waiters >= self.PLAN_QUEUE_LIMIT:
                raise ServiceBusy(
                    f"plan queue full ({self.PLAN_QUEUE_LIMIT} waiting); "
                    "retry later")
            self._plan_waiters += 1
        try:
            if not self._plan_lock.acquire(
                    timeout=self.PLAN_WAIT_TIMEOUT_S):
                raise ServiceBusy(
                    f"timed out after {self.PLAN_WAIT_TIMEOUT_S:.0f}s "
                    "waiting for the planning lock; retry later")
        finally:
            with self._waiters_lock:
                self._plan_waiters -= 1
        try:
            yield
        finally:
            self._plan_lock.release()

    def health(self):
        import jax

        from . import __version__

        if self.startup_error is not None:
            status = "error"
        elif self.ready.is_set():
            status = "ok"
        else:
            status = "warming"
        out = {"status": status, "backend": jax.default_backend(),
               "n_devices": len(jax.devices()), "version": __version__}
        if self.startup_error is not None:
            out["error"] = f"{type(self.startup_error).__name__}: " \
                           f"{self.startup_error}"
        return out

    def synthesize(self, payload):
        from .ops.normalize import inv_normalize_cp

        cp = decode_array(payload["cp"])
        if payload.get("normalized", True):
            cp = inv_normalize_cp(cp)
        sig, sr = self.model._synth_pool.speak(cp)
        return {"audio": encode_array(sig), "sample_rate": sr}

    def embed(self, payload):
        import jax

        mel = decode_array(payload["mel"])
        semvec = self.model._embed(mel[None])
        return {"semvec": encode_array(np.asarray(jax.device_get(semvec))[0])}

    def plan_batch(self, payload):
        """Plan several utterances data-parallel: {"signals": [<array>, ...],
        "sample_rate": int, ...plan kwargs}.  Utterances bucket by exact mel
        length (experiments.plan_corpus_batched); per-utterance results
        return in input order."""
        from .experiments import plan_corpus_batched

        payload = dict(payload)
        signals = [decode_array(s) for s in payload.pop("signals")]
        sr = int(payload.pop("sample_rate", 44100))
        max_batch = int(payload.pop("max_batch", 8))
        allowed = {"objective", "n_outer", "n_inner", "continue_learning",
                   "batch_size", "n_epochs", "learning_rate_planning"}
        unknown = set(payload) - allowed
        if unknown:
            raise ValueError(
                f"unknown plan_batch parameters: {sorted(unknown)}; "
                f"allowed: {sorted(allowed)}")
        with self._plan_slot():
            per_utt = plan_corpus_batched(
                self.model, [(s, sr) for s in signals], max_batch=max_batch,
                plan_kwargs=dict(payload), verbose=False)
        return {"results": [
            {"planned_cp": encode_array(r["planned_cp"]),
             "audio": encode_array(r["prod_sig"]),
             "sample_rate": 44100,
             "prod_loss_curve": [float(x) for x in r["prod_loss_curve"]]}
            for r in per_utt]}

    def plan(self, payload):
        payload = dict(payload)
        sig = decode_array(payload.pop("signal"))
        sr = int(payload.pop("sample_rate", 44100))
        allowed = {
            "objective", "initialize_from", "n_outer", "n_inner", "log_ii",
            "n_batches", "batch_size", "n_epochs", "continue_learning",
            "learning_rate_planning", "learning_rate_learning",
            "log_semantics", "seed",
        }
        unknown = set(payload) - allowed
        if unknown:
            raise ValueError(
                f"unknown plan parameters: {sorted(unknown)}; "
                f"allowed: {sorted(allowed)}")
        kwargs = dict(payload)
        with self._plan_slot():
            results = self.model.plan_resynth(
                target_acoustic=(sig, sr), verbose=False, **kwargs)
        return {
            "planned_cp": encode_array(results.planned_cp),
            "audio": encode_array(results.prod_sig),
            "sample_rate": results.prod_sr,
            "prod_loss_steps": [float(x) for x in results.prod_loss_steps],
            "planned_loss_steps": [float(x)
                                   for x in results.planned_loss_steps],
        }


def make_server(service, host="127.0.0.1", port=8750):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet by default
            pass

        def _send(self, code, obj, headers=None):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            for name, value in (headers or {}).items():
                self.send_header(name, value)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, service.health())
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            try:
                if service.startup_error is not None:
                    self._send(503, {"error": "startup failed: "
                               f"{type(service.startup_error).__name__}: "
                               f"{service.startup_error}"})
                    return
                if not service.ready.is_set():
                    self._send(503, {"error": "warming up (compiling XLA "
                                              "programs); retry shortly"})
                    return
                n = int(self.headers.get("Content-Length", 0))
                if n > service.MAX_REQUEST_BYTES:
                    self._send(413, {
                        "error": f"request body {n} bytes exceeds the "
                                 f"{service.MAX_REQUEST_BYTES}-byte limit"})
                    # drain the unread body so closing the socket doesn't
                    # RST a client that is still mid-upload (which would
                    # discard the 413 bytes before the client reads them);
                    # absolute cap so a hostile Content-Length can't hold
                    # the worker forever
                    self.wfile.flush()
                    remaining = min(n, 1 << 28)
                    while remaining > 0:
                        chunk = self.rfile.read(min(remaining, 1 << 20))
                        if not chunk:
                            break
                        remaining -= len(chunk)
                    return
                payload = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/synthesize":
                    self._send(200, service.synthesize(payload))
                elif self.path == "/embed":
                    self._send(200, service.embed(payload))
                elif self.path == "/plan":
                    self._send(200, service.plan(payload))
                elif self.path == "/plan_batch":
                    self._send(200, service.plan_batch(payload))
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})
            except ServiceBusy as exc:
                self._send(429, {"error": str(exc)},
                           headers={"Retry-After": "30"})
            except (KeyError, ValueError, TypeError) as exc:
                self._send(400, {"error": f"{type(exc).__name__}: {exc}"})
            except Exception as exc:  # noqa: BLE001
                self._send(500, {"error": f"{type(exc).__name__}: {exc}"})

    return ThreadingHTTPServer((host, port), Handler)


class WarmupTimeout(RuntimeError):
    """Warmup was still running at the watchdog deadline."""


def start_warmup(service, lengths, warmup_timeout=None):
    """Build the model (if deferred) and run :func:`_warmup` in a daemon
    thread.  With ``warmup_timeout`` (seconds) a watchdog thread flips
    /health to "error" if warmup is still running at the deadline — a
    wedged accelerator tunnel hangs the underlying compile/RPC forever, and
    without the watchdog the server would report "warming" indefinitely.
    A late warmup completion clears the watchdog's error and serves
    normally."""
    service.ready.clear()
    # serializes the completion/deadline handoff: without it the watchdog
    # can pass its checks, lose the CPU to a completing warmup (which sees
    # no error to clear and sets ready), then assign WarmupTimeout — a
    # successfully warmed server stuck reporting "error" forever
    guard = threading.Lock()

    def _run_warmup():
        try:
            if service.model is None:
                service._build_model()
            _warmup(service.model, lengths)
            with guard:
                if isinstance(service.startup_error, WarmupTimeout):
                    service.startup_error = None  # late recovery
                service.ready.set()
            print("paule_tpu warmup complete")
        except Exception as exc:  # noqa: BLE001
            service.startup_error = exc
            print(f"paule_tpu startup FAILED: "
                  f"{type(exc).__name__}: {exc}")

    threading.Thread(target=_run_warmup, daemon=True).start()
    if warmup_timeout:
        def _watchdog():
            if not service.ready.wait(warmup_timeout):
                with guard:
                    if (not service.ready.is_set()
                            and service.startup_error is None):
                        service.startup_error = WarmupTimeout(
                            f"warmup still running after "
                            f"{warmup_timeout:.0f}s (wedged accelerator "
                            "tunnel or cold remote compile); compute "
                            "endpoints stay 503 until it completes")

        threading.Thread(target=_watchdog, daemon=True).start()


def serve(host="127.0.0.1", port=8750, *, paule_model=None, warmup=True,
          warmup_timeout=1800.0, **paule_kwargs):
    """Start serving (blocking).

    ``warmup``: ``True`` runs a tiny planning call in the background so the
    XLA programs are compiled before real traffic; an iterable of cp-frame
    lengths precompiles each of those utterance lengths; ``False``/``None``
    serves immediately (first requests pay compilation).  With warmup on,
    the port binds IMMEDIATELY and /health reports "warming" until it
    finishes (remote XLA compilation can take minutes on a cold cache — an
    invisible port for that long breaks orchestrator liveness checks); if
    model construction or warmup fails, /health reports "error" and the
    compute endpoints 503 with the failure.  ``warmup_timeout`` (seconds,
    0/None disables) bounds how long /health may report "warming": past the
    deadline it reports "error" with a :class:`WarmupTimeout` detail (the
    usual cause is a wedged accelerator tunnel whose RPCs hang forever); a
    late warmup completion clears the error and serves normally."""
    if warmup is True:
        lengths = (40,)
    elif not warmup:  # False, None, empty iterable
        lengths = ()
    else:
        lengths = tuple(int(x) for x in warmup) or (40,)
    do_warm = bool(lengths)
    service = PauleService(paule_model, defer_model=do_warm, **paule_kwargs)
    server = make_server(service, host, port)
    if do_warm:
        start_warmup(service, lengths, warmup_timeout)
    print(f"paule_tpu serving on http://{host}:{port}")
    server.serve_forever()


def _warmup(model, cp_lengths=(40,)):
    """Compile the planning programs by running tiny plans.

    XLA programs are shape-specialized: the first request at a NEW
    utterance length compiles from scratch (minutes over a cold remote
    cache).  Passing the production length distribution as extra
    ``cp_lengths`` (cp frames = 2 x mel frames, even) precompiles them all
    during startup while /health still says "warming".

    The warmup plans exercise continue-learning (so its programs compile
    too), which trains the models on noise; the model state (weights,
    optimizer moments, replay buffer, RNG) is snapshotted before and
    restored after, so the served model is exactly the loaded one."""
    from . import checkpoint, synth
    from .ops.normalize import inv_normalize_cp

    state = checkpoint.to_host(checkpoint.paule_state(model))
    py_rng_state = model._py_rng.getstate()
    try:
        rng = np.random.default_rng(0)
        for n_cp in cp_lengths:
            n_cp = max(4, int(n_cp) + (int(n_cp) % 2))  # even length
            cp = np.clip(rng.normal(0, 0.1, (n_cp, 30)).cumsum(0) * 0.1,
                         -1, 1)
            sig, sr = synth.speak(inv_normalize_cp(cp))
            model.plan_resynth(
                target_acoustic=(sig, sr), objective="acoustic",
                initialize_from="acoustic", n_outer=1, n_inner=2,
                log_ii=1, n_batches=1, batch_size=2, n_epochs=1,
                continue_learning=True, verbose=False)
    finally:
        checkpoint.restore_paule_state(model, state)
        model._py_rng.setstate(py_rng_state)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description="paule_tpu HTTP service")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8750)
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--warmup-lengths", default=None,
                    help="comma-separated cp-frame lengths to precompile "
                         "(= 2 x mel frames of expected requests), e.g. "
                         "'40,200,400'")
    ap.add_argument("--warmup-timeout", type=float, default=1800.0,
                    help="seconds before a still-running warmup flips "
                         "/health to 'error' (0 disables)")
    ap.add_argument("--pretrained-dir", default=None)
    args = ap.parse_args()
    if args.no_warmup:
        warmup = False
    elif args.warmup_lengths:
        warmup = [int(x) for x in args.warmup_lengths.split(",") if x]
    else:
        warmup = True
    serve(args.host, args.port, warmup=warmup,
          warmup_timeout=args.warmup_timeout,
          pretrained_dir=args.pretrained_dir)
