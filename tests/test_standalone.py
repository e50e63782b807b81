"""The package stands alone: every feature except the authentic-VTL extras
works with NO reference checkout present (packaging intent, pyproject.toml;
the reference itself is only an optional comparison target).

The subprocess installs an audit hook that turns any read of
``/root/reference`` into a hard error, then runs a representative
end-to-end flow: synth init, copy-synthesis target, a full (tiny-budget)
``plan_resynth`` with continue-learning, checkpoint save/load, and the
availability probes reporting the degraded state.
"""

import os
import subprocess
import sys

import pytest

_STANDALONE_FLOW = r"""
import os, sys

def _block(event, args):
    if event in ("open", "ctypes.dlopen") and args:
        p = args[0]
        p = os.fspath(p) if isinstance(p, (str, bytes, os.PathLike)) else ""
        if isinstance(p, bytes):
            p = p.decode(errors="replace")
        if p.startswith("/root/reference"):
            raise RuntimeError(f"blocked {event} of {p!r}")
sys.addaudithook(_block)

import numpy as np
from paule_tpu import synth
from paule_tpu.api import Paule
from paule_tpu.ops.normalize import inv_normalize_cp
from paule_tpu.reference_bridge import reference_available
from paule_tpu.synth.vtl_plant import vtl_available

# availability probes degrade (hidden via env), no exception
assert not reference_available()
assert not vtl_available()

synth.initialize()
p = Paule(seed=1)
rng = np.random.default_rng(0)
cp = np.clip(rng.normal(0, 0.1, (24, 30)).cumsum(0) * 0.1, -1, 1)
target = synth.speak(inv_normalize_cp(cp))
r = p.plan_resynth(target_acoustic=target, objective="acoustic",
                   n_outer=1, n_inner=2, log_ii=1, continue_learning=True,
                   n_epochs=1, batch_size=2, n_batches=1, verbose=False)
assert np.isfinite(float(r.prod_loss_steps[-1]))

# persistence round-trips without the reference
from paule_tpu.checkpoint import paule_state, save_pytree, load_pytree
path = os.path.join(os.environ["STANDALONE_TMP"], "state.pkl")
save_pytree(path, paule_state(p))
load_pytree(path)
print("STANDALONE_OK")
"""


@pytest.mark.slow
def test_standalone_no_reference_flow(tmp_path):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PAULE_TPU_HIDE_REFERENCE": "1",
        "STANDALONE_TMP": str(tmp_path),
    })
    proc = subprocess.run(
        [sys.executable, "-c", _STANDALONE_FLOW], env=env,
        capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "STANDALONE_OK" in proc.stdout


def test_hide_reference_env(monkeypatch):
    from paule_tpu import reference_bridge
    from paule_tpu.synth import vtl_plant

    monkeypatch.setenv("PAULE_TPU_HIDE_REFERENCE", "1")
    assert not reference_bridge.reference_available()
    assert not vtl_plant.vtl_available()
    monkeypatch.setenv("PAULE_TPU_HIDE_REFERENCE", "0")
    # with the knob off, availability reflects the filesystem again
    expect = os.path.isdir("/root/reference/paule")
    assert reference_bridge.reference_available() == expect
