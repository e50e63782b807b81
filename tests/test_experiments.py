"""Corpus-planning experiment driver: discovery/resume semantics, the
plan->save->aggregate loop, and checkpointing."""

import os

import numpy as np
import pytest

from paule_tpu import experiments, synth
from paule_tpu.api import Paule
from paule_tpu.dsp import audio as audio_io
from paule_tpu.ops.normalize import inv_normalize_cp


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    synth.initialize()
    rng = np.random.default_rng(0)
    for label, name in [("ba", "u1"), ("da", "u2")]:
        d = root / label
        d.mkdir()
        cp = np.clip(rng.normal(0, 0.1, (40, 30)).cumsum(0) * 0.1, -1, 1)
        sig, sr = synth.speak(inv_normalize_cp(cp))
        audio_io.write(str(d / f"{name}_{label}.wav"), sig, sr)
    return str(root)


def test_discover_and_label(corpus):
    files = experiments.discover_targets(corpus, shuffle=False)
    assert len(files) == 2
    assert sorted(experiments.label_of(f) for f in files) == ["ba", "da"]


def test_plan_corpus_and_collect(corpus, tmp_path):
    save_dir = str(tmp_path / "out")
    p = Paule(seed=3)
    files = experiments.discover_targets(corpus, shuffle=False)
    semvecs = {"ba": np.zeros(300), "da": np.zeros(300)}
    result_files = experiments.plan_corpus(
        p, files, save_dir, semvec_lookup=semvecs, checkpoint_every=1,
        verbose=False,
        plan_kwargs=dict(n_outer=1, n_inner=2, log_ii=1, n_batches=1,
                         batch_size=2, n_epochs=1, continue_learning=True))
    assert len(result_files) == 2
    assert os.path.exists(os.path.join(save_dir, "checkpoint.pkl"))
    assert all(os.path.exists(f) for f in result_files)
    # planned audio written next to results (flac, or wav without ffmpeg)
    planned = [f.replace("_results.pkl", "_planned")
               for f in result_files]
    assert all(os.path.exists(f + ".flac") or os.path.exists(f + ".wav")
               for f in planned)

    final = experiments.collect_results(save_dir)
    assert len(final) == 2
    assert np.isfinite(final["prod_loss"]).all()
    assert os.path.exists(os.path.join(save_dir, "results_loss.txt"))
    assert os.path.exists(os.path.join(save_dir, "final_results.pkl"))

    # resume: everything planned -> nothing left to do
    remaining = experiments.discover_targets(corpus, save_dir=save_dir)
    assert remaining == []


def test_plan_corpus_batched_mixed_lengths(tmp_path):
    """Variable-length corpus planning: utterances bucket by exact mel
    length, plan in dp batches, and return per-utterance results in input
    order."""
    import numpy as np
    from paule_tpu import synth
    from paule_tpu.api import Paule
    from paule_tpu.experiments import plan_corpus_batched
    from paule_tpu.ops.normalize import inv_normalize_cp

    synth.initialize()
    p = Paule(seed=21)
    rng = np.random.default_rng(9)
    targets = []
    for n_cp in (24, 24, 32, 24, 32):  # two length buckets, one leftover
        cp = np.clip(rng.normal(0, 0.1, (n_cp, 30)).cumsum(0) * 0.1, -1, 1)
        targets.append(synth.speak(inv_normalize_cp(cp)))

    results = plan_corpus_batched(
        p, targets, max_batch=2, verbose=False,
        plan_kwargs=dict(n_outer=1, n_inner=2, objective="acoustic",
                         continue_learning=False))
    assert len(results) == 5
    for i, n_cp in enumerate((24, 24, 32, 24, 32)):
        assert results[i]["planned_cp"].shape == (n_cp, 30)
        assert results[i]["prod_loss_curve"].shape == (1,)
        assert np.isfinite(results[i]["prod_loss_curve"]).all()
        assert results[i]["prod_sig"].shape == ((n_cp - 1) * 110,)


def test_discover_targets_skips_batched_results(tmp_path):
    import os
    from paule_tpu.experiments import discover_targets

    data = tmp_path / "data" / "lab"
    data.mkdir(parents=True)
    for stem in ("a_lab", "b_lab"):
        (data / f"{stem}.wav").write_bytes(b"RIFF")
    save = tmp_path / "save" / "lab"
    save.mkdir(parents=True)
    (save / "a_lab_batched.pkl").write_bytes(b"x")

    files = discover_targets(str(tmp_path / "data"),
                             save_dir=str(tmp_path / "save"), shuffle=False)
    assert [os.path.basename(f) for f in files] == ["b_lab.wav"]


def test_plan_corpus_batched_pad_to_multiple():
    """pad_to_multiple merges near-lengths into shared buckets (silence-
    padded targets), and every per-utterance output is trimmed back to its
    TRUE length."""
    from paule_tpu.experiments import plan_corpus_batched

    synth.initialize()
    p = Paule(seed=22)
    rng = np.random.default_rng(10)
    lengths = (22, 26, 30, 32)  # all distinct: exact bucketing -> 4 buckets
    targets = []
    for n_cp in lengths:
        cp = np.clip(rng.normal(0, 0.1, (n_cp, 30)).cumsum(0) * 0.1, -1, 1)
        targets.append(synth.speak(inv_normalize_cp(cp)))

    # count actual plan_batch_resynth invocations: merging is THE claim
    from paule_tpu.parallel import batched as _batched
    bucket_sizes = []
    real_pbr = _batched.plan_batch_resynth

    def counting_pbr(model, targets, *args, **kwargs):
        bucket_sizes.append(len(targets))
        return real_pbr(model, targets, *args, **kwargs)

    results = None
    try:
        _batched.plan_batch_resynth = counting_pbr
        results = plan_corpus_batched(
            p, targets, max_batch=4, verbose=False, pad_to_multiple=16,
            plan_kwargs=dict(n_outer=1, n_inner=2, objective="acoustic",
                             continue_learning=False))
    finally:
        _batched.plan_batch_resynth = real_pbr
    assert results is not None and len(results) == 4
    for i, n_cp in enumerate(lengths):
        assert results[i]["planned_cp"].shape == (n_cp, 30)
        assert results[i]["prod_sig"].shape == ((n_cp - 1) * 110,)
        assert results[i]["prod_mel"].shape[0] == n_cp // 2
        assert np.isfinite(results[i]["prod_loss_curve"]).all()
    # 22,26,30,32 cp frames = 11,13,15,16 mel frames -> all pad to 16: ONE
    # bucket of 4 (one compile) instead of 4 buckets of 1
    assert bucket_sizes == [4]
