"""The real pretrained-weights loading path, exercised end to end.

The reference ships a 200 MB ``pretrained_models/`` zip whose exact
filenames are hard-coded in ``Paule.__init__``
(/root/reference/paule/paule.py:126,148,169,192,204,219,239,254,269).
That artifact is not downloadable in this environment (no network egress),
so these tests build a fixture tree with the reference's REAL layout and
filenames, filled with seeded state dicts saved from the reference's OWN
model classes at the shipped full sizes, and assert that
``Paule(pretrained_dir=...)`` converts every file into the right slot —
including the ``cp_to_tube``/``tube_to_mel``/``tube_to_vector`` filename
filters inside the shared ``somatosensory/`` directory (api.py
``_load_pretrained``).
"""

import importlib.util
import pathlib

import numpy as np
import jax
import pytest
import torch

import paule_tpu  # noqa: F401  (x64 via conftest env)
from paule_tpu.api import Paule
from paule_tpu.models import torch_convert as TC

from paule_tpu.reference_bridge import reference_available

REF_MODELS = pathlib.Path("/root/reference/paule/models.py")

pytestmark = pytest.mark.skipif(
    not (reference_available() and REF_MODELS.exists()),
    reason="reference checkout not available")

#: the reference's exact shipped filenames (paule.py lines cited above)
FILES = {
    "predictive": "predictive/pred_model_common_voice_1_720_lr_0001_50_"
                  "00001_50_000001_50_0000001_200.pt",
    "inverse": "inverse/inv_model_common_voice_3_1_720_5_lr_0001_50_00001_"
               "50_000001_50_0000001_200.pt",
    "embedder": "embedder/embed_model_common_voice_syn_rec_2_720_0_dropout_"
                "07_noise_6e05_rmse_lr_00001_200.pt",
    "cp_gan": "cp_gan/conditional_trained_cp_generator_whole_critic_it_5_"
              "10_20_40_80_100_415.pt",
    "mel_gan": "mel_gan/conditional_trained_mel_generator_synthesized_"
               "critic_it_5_10_20_40_80_100_400.pt",
    "speech_classifier": "speech_classifier/linear_model_rec_as_"
                         "nonspeech.pt",
    "cp_tube": "somatosensory/cp_to_tube_model_1_360_lr_0001_50_00001_"
               "100.pt",
    "tube_mel": "somatosensory/tube_to_mel_model_1_360_lr_0001_50_00001_"
                "100.pt",
    "tube_embedder": "somatosensory/tube_to_vector_model_2_720_0_dropout_"
                     "07_noise_6e05_rmse_lr_00001_200.pt",
}

CONVERT_KIND = {
    "predictive": "forward", "inverse": "inverse", "embedder": "embedder",
    "cp_gan": "generator", "mel_gan": "generator",
    "speech_classifier": "linear_classifier",
    "cp_tube": "forward", "tube_mel": "forward",
    "tube_embedder": "embedder",
}


def _reference_models_module():
    spec = importlib.util.spec_from_file_location("ref_paule_models_tree",
                                                  str(REF_MODELS))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """pretrained_models/ fixture with the shipped full-size configs
    (paule.py:124-273)."""
    ref = _reference_models_module()
    torch.manual_seed(42)
    builders = {
        "predictive": lambda: ref.ForwardModel(
            num_lstm_layers=1, hidden_size=720),
        "inverse": lambda: ref.InverseModelMelTimeSmoothResidual(
            num_lstm_layers=1, hidden_size=720),
        "embedder": lambda: ref.EmbeddingModel(
            num_lstm_layers=2, hidden_size=720),
        "cp_gan": lambda: ref.Generator(),
        "mel_gan": lambda: ref.Generator(output_size=60),
        "speech_classifier": lambda: ref.LinearClassifier(60, 1),
        "cp_tube": lambda: ref.ForwardModel(
            input_size=30, output_size=10, hidden_size=360,
            num_lstm_layers=1, apply_half_sequence=False),
        "tube_mel": lambda: ref.ForwardModel(
            input_size=10, output_size=60, hidden_size=360,
            num_lstm_layers=1, apply_half_sequence=True),
        "tube_embedder": lambda: ref.EmbeddingModel(
            input_size=10, num_lstm_layers=2, hidden_size=720,
            dropout=0.7),
    }
    root = tmp_path_factory.mktemp("pretrained_models")
    for key, rel in FILES.items():
        path = root / rel
        path.parent.mkdir(parents=True, exist_ok=True)
        torch.save(builders[key]().double().state_dict(), path)
    (root / "version.txt").write_text("fixture-r3\n")
    return root


def _assert_same_tree(got, torch_file, kind):
    want = TC.convert(kind, str(torch_file))
    got_leaves, got_def = jax.tree.flatten(got)
    want_leaves, want_def = jax.tree.flatten(want)
    assert got_def == want_def
    for g, w in zip(got_leaves, want_leaves):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=0, rtol=0)


@pytest.mark.slow
def test_all_acoustic_slots_filled_from_tree(tree):
    p = Paule(pretrained_dir=str(tree), use_speech_classifier=True)
    for key, attr in [("predictive", "pred_params"),
                      ("inverse", "inv_params"),
                      ("embedder", "embedder_params"),
                      ("cp_gan", "cp_gen_params"),
                      ("mel_gan", "mel_gen_params"),
                      ("speech_classifier", "speech_classifier_params")]:
        _assert_same_tree(getattr(p, attr), tree / FILES[key],
                          CONVERT_KIND[key])


@pytest.mark.slow
def test_somatosensory_filename_filters(tree):
    """The three files share somatosensory/; the loader must route each by
    its cp_to_tube/tube_to_mel/tube_to_vector filename marker."""
    p = Paule(pretrained_dir=str(tree), use_somatosensory_feedback=True)
    _assert_same_tree(p.cp_tube_params, tree / FILES["cp_tube"], "forward")
    _assert_same_tree(p.tube_mel_params, tree / FILES["tube_mel"], "forward")
    _assert_same_tree(p.tube_embedder_params, tree / FILES["tube_embedder"],
                      "embedder")
    # routed, not just loaded: the two forward-kind files differ in shape
    assert (p.cp_tube_params["lstm"][0]["w_ih"].shape[0] == 30
            and p.tube_mel_params["lstm"][0]["w_ih"].shape[0] == 10)


def test_missing_dir_raises():
    with pytest.raises(FileNotFoundError):
        Paule(pretrained_dir="/nonexistent/pretrained_models")


def test_partial_tree_falls_back_random(tree, tmp_path):
    """Only the predictive file present: that slot converts, the rest fall
    back to seeded random init without error."""
    partial = tmp_path / "partial"
    (partial / "predictive").mkdir(parents=True)
    src = tree / FILES["predictive"]
    (partial / FILES["predictive"]).write_bytes(src.read_bytes())
    p = Paule(pretrained_dir=str(partial))
    _assert_same_tree(p.pred_params, src, "forward")
    assert p.inv_params is not None and p.embedder_params is not None
