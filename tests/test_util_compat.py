"""The paule_tpu.util compatibility facade must expose the reference's
paule.util surface (/root/reference/paule/util.py)."""

import numpy as np

from paule_tpu import util


def test_surface_complete():
    names = [
        # constants
        "cp_means", "cp_stds", "cp_theoretical_means", "cp_theoretical_stds",
        "tube_mins", "tube_maxs", "tube_theoretical_means",
        "tube_theoretical_stds", "mel_mean_librosa", "mel_std_librosa",
        "ARTICULATOR",
        # normalization
        "normalize_cp", "inv_normalize_cp", "normalize_tube",
        "inv_normalize_tube", "normalize_mel_librosa",
        "inv_normalize_mel_librosa",
        # dsp
        "librosa_melspec", "mel_to_sig", "stereo_to_mono", "audio_padding",
        # padding / batching
        "add_and_pad", "pad_batch_online", "pad_same_to_even_seq_length",
        "half_seq_by_average_pooling", "array_to_tensor",
        # synthesis
        "speak", "speak_and_extract_tube_information", "export_svgs",
        "cps_to_ema", "cps_to_ema_and_mesh", "seg_to_cps", "ges_to_cps",
        "read_cp", "get_area_info_within_oral_cavity",
        # numerics
        "calculate_five_point_stencil_without_padding", "numeric_derivative",
        "local_linear", "get_vel_acc_jerk", "rmse_loss", "cp_trajectory_loss",
        # weights distribution
        "download_pretrained_weights", "get_pretrained_weights_version",
    ]
    missing = [n for n in names if not hasattr(util, n)]
    assert not missing, f"missing util compat members: {missing}"


def test_array_to_tensor():
    out = util.array_to_tensor(np.zeros((4, 30)))
    assert out.shape == (1, 4, 30)


def test_get_pretrained_weights_version_without_download():
    assert "No version file" in util.get_pretrained_weights_version() or \
        isinstance(util.get_pretrained_weights_version(), str)


def test_speaker_file_loading(tmp_path):
    """a speaker file can override anatomy and phones."""
    from paule_tpu import synth

    spk = tmp_path / "custom.speaker"
    spk.write_text(
        "[meta]\nname = custom\n"
        "[anatomy]\nbase_length_cm = 17.5\n")
    lib = synth.initialize(str(spk))
    assert lib is not None
    c = synth.get_constants()
    assert c["n_tract_params"] == 19
    # longer tract -> larger incisor distance than default
    info = synth.get_param_info("tract")
    neutral = info["neutrals"]
    _tl, _ta, _ai, inc_custom, *_ = synth.tract_to_tube(neutral)
    synth.initialize("default")
    _tl, _ta, _ai, inc_default, *_ = synth.tract_to_tube(neutral)
    assert inc_custom > inc_default
