"""CLI (`python -m paule_tpu`): the reference has no CLI; ours wraps the
same entry points its example scripts expose."""

import os
import pickle

import numpy as np
import pytest

from paule_tpu import synth, __main__ as cli
from paule_tpu.ops.normalize import inv_normalize_cp
from paule_tpu.dsp import audio as audio_io


@pytest.fixture(scope="module")
def target_wav(tmp_path_factory):
    synth.initialize()
    rng = np.random.default_rng(0)
    cp = np.clip(rng.normal(0, 0.1, (40, 30)).cumsum(0) * 0.1, -1, 1)
    sig, sr = synth.speak(inv_normalize_cp(cp))
    path = tmp_path_factory.mktemp("cli") / "word.wav"
    audio_io.write(str(path), sig, sr)
    return str(path)


def test_sysinfo(capsys):
    cli.main(["sysinfo"])
    out = capsys.readouterr().out
    assert "paule_tpu" in out


@pytest.mark.slow
def test_plan(tmp_path, target_wav, capsys):
    save = str(tmp_path / "out" / "word")
    cli.main(["plan", "--target", target_wav, "--save", save,
              "--n-outer", "1", "--n-inner", "2", "--n-epochs", "1",
              "--n-batches", "1", "--batch-size", "2", "--seed", "1",
              "--quiet"])
    assert os.path.exists(save + ".pkl")
    assert os.path.exists(save + "_state.pkl")
    with open(save + ".pkl", "rb") as fh:
        results = pickle.load(fh)
    assert results.planned_cp.shape[1] == 30


def test_seg2wav(tmp_path, capsys):
    seg = tmp_path / "word.seg"
    seg.write_text("name = a; duration_s = 0.10;\n"
                   "name = l; duration_s = 0.08;\n")
    out = str(tmp_path / "word.wav")
    cli.main(["seg2wav", "--seg", str(seg), "--out", out])
    assert os.path.exists(out)
    sig, sr = audio_io.read(out)
    assert sr == 44100 and len(sig) > 1000


def test_babble(tmp_path):
    out = str(tmp_path / "babble.pkl")
    cli.main(["babble", "--n", "3", "--min-len", "20", "--max-len", "24",
              "--out", out, "--workers", "2"])
    import pandas as pd

    df = pd.read_pickle(out)
    assert len(df) == 3
