"""ctypes bridge to the paule_tpu C++ articulatory synthesizer.

Provides the same functional surface the reference's Python layer consumed
from the VocalTractLab binary (/root/reference/paule/util.py:175-433,
542-561, 729-887), plus a handle-based :class:`SynthPool` for concurrent
synthesis (the reference's VTL is a global singleton and therefore a
serialized host resource — ours is not).

The library initializes lazily on first use, not at import time.
"""

import ctypes
import os
import tempfile
import threading

import numpy as np

from . import build as _build
from ..ops.normalize import N_CP, N_GLOTTIS, N_TRACT

ARTICULATOR = {
    0: "vocal folds",
    1: "tongue",
    2: "lower incisors",
    3: "lower lip",
    4: "other articulator",
    5: "num articulators",
}

FRAME_STEPS = 110  # samples per control frame (2.5 ms @ 44.1 kHz)
SAMPLE_RATE = 44100
N_TUBE_SECTIONS = 40

_lib = None
_lib_lock = threading.Lock()
_initialized = False


def _load():
    global _lib
    with _lib_lock:
        if _lib is None:
            path = _build.build()
            _lib = ctypes.cdll.LoadLibrary(path)
            _lib.pts_create.restype = ctypes.c_void_p
            _lib.pts_create.argtypes = [ctypes.c_char_p]
            _lib.pts_destroy.argtypes = [ctypes.c_void_p]
    return _lib


def initialize(speaker_path="default"):
    """Initialize the default synthesizer instance from a speaker file."""
    global _initialized
    lib = _load()
    failure = lib.pts_initialize(str(speaker_path).encode())
    if failure != 0:
        raise ValueError(f"Error in pts_initialize! Errorcode: {failure}")
    _initialized = True
    return lib


def _default():
    if not _initialized:
        initialize()
    return _lib


def version():
    lib = _load()
    buf = ctypes.create_string_buffer(64)
    lib.pts_get_version(buf, 64)
    return buf.value.decode()


def get_constants():
    lib = _default()
    sr = ctypes.c_int(0)
    n_tube = ctypes.c_int(0)
    n_tract = ctypes.c_int(0)
    n_glottis = ctypes.c_int(0)
    n_per_state = ctypes.c_int(0)
    internal = ctypes.c_double(0)
    lib.pts_get_constants(
        ctypes.byref(sr), ctypes.byref(n_tube), ctypes.byref(n_tract),
        ctypes.byref(n_glottis), ctypes.byref(n_per_state),
        ctypes.byref(internal))
    return {
        "audio_sampling_rate": sr.value,
        "n_tube_sections": n_tube.value,
        "n_tract_params": n_tract.value,
        "n_glottis_params": n_glottis.value,
        "n_samples_per_state": n_per_state.value,
        "internal_sampling_rate": internal.value,
    }


def get_param_info(which="tract"):
    lib = _default()
    n = N_TRACT if which == "tract" else N_GLOTTIS
    names = ctypes.create_string_buffer(512)
    mins = (ctypes.c_double * n)()
    maxs = (ctypes.c_double * n)()
    neutrals = (ctypes.c_double * n)()
    fn = (lib.pts_get_tract_param_info if which == "tract"
          else lib.pts_get_glottis_param_info)
    fn(names, 512, ctypes.byref(mins), ctypes.byref(maxs), ctypes.byref(neutrals))
    return {
        "names": names.value.decode().split(),
        "mins": np.array(mins[:]),
        "maxs": np.array(maxs[:]),
        "neutrals": np.array(neutrals[:]),
    }


def _check_finite(arr, what):
    """Reject non-finite values at the FFI boundary.  The C core's
    branch-free fast-math (fastmath.h) assumes finite inputs — a NaN would
    reach a float->int64 cast (formally UB, flagged by
    -fsanitize=float-cast-overflow) and come back as NaN audio; failing
    loudly here keeps the native layer's input contract airtight for
    direct users (the planner already guards its own trajectories,
    api._synthesize)."""
    if not np.isfinite(arr).all():
        raise ValueError(f"{what} contains non-finite values")
    return arr


def _check_cp(cp_param):
    cp = np.ascontiguousarray(cp_param, dtype=np.float64)
    if cp.ndim != 2 or cp.shape[1] != N_CP:
        raise ValueError(f"cp_param must be (seq, {N_CP}), got {cp.shape}")
    return _check_finite(cp, "cp_param")


def speak(cp_param):
    """Synthesize audio from a denormalized cp trajectory.

    Behavioral contract of the reference's ``speak``
    (/root/reference/paule/util.py:175-249): input ``(seq, 30)``, output
    ``(audio[(seq-1)*110], 44100)``.
    """
    lib = _default()
    cp = _check_cp(cp_param)
    consts = get_constants()
    assert consts["audio_sampling_rate"] == SAMPLE_RATE
    assert consts["n_tract_params"] == N_TRACT
    assert consts["n_glottis_params"] == N_GLOTTIS

    n_frames = cp.shape[0]
    n_audio = max(0, (n_frames - 1) * FRAME_STEPS)
    audio = np.zeros(n_audio, dtype=np.float64)
    tract = np.ascontiguousarray(cp[:, :N_TRACT])
    glottis = np.ascontiguousarray(cp[:, N_TRACT:])

    failure = lib.pts_synthesis_reset()
    if failure != 0:
        raise ValueError(f"Error in pts_synthesis_reset! Errorcode: {failure}")
    failure = lib.pts_synth_block(
        tract.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        glottis.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n_frames, FRAME_STEPS,
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if failure != 0:
        raise ValueError(f"Error in pts_synth_block! Errorcode: {failure}")
    return audio, SAMPLE_RATE


def _speak_and_extract_core(cp_param, c_entry):
    """Whole-trajectory incremental synthesis + per-frame tube extraction in
    ONE native call (behavioral contract of
    /root/reference/paule/util.py:317-433; the reference crosses the FFI
    2*T times per trajectory — this crosses once)."""
    cp = _check_cp(cp_param)
    n_frames = cp.shape[0]
    tract = np.ascontiguousarray(cp[:, :N_TRACT])
    glottis = np.ascontiguousarray(cp[:, N_TRACT:])

    audio = np.zeros(max(0, (n_frames - 1)) * FRAME_STEPS, dtype=np.float64)
    if n_frames == 0:
        empty = np.zeros((0, N_TUBE_SECTIONS))
        return audio, SAMPLE_RATE, {
            "tube_length_cm": empty, "tube_area_cm2": empty,
            "tube_articulator": np.zeros((0, N_TUBE_SECTIONS), dtype=object),
            "incisor_pos_cm": np.zeros(0),
            "tongue_tip_side_elevation": np.zeros(0),
            "velum_opening_cm2": np.zeros(0),
        }
    tube_length = np.zeros((n_frames, N_TUBE_SECTIONS))
    tube_area = np.zeros((n_frames, N_TUBE_SECTIONS))
    tube_articulator_idx = np.zeros((n_frames, N_TUBE_SECTIONS),
                                    dtype=np.int32)
    incisor = np.zeros(n_frames)
    tongue_tip = np.zeros(n_frames)
    velum = np.zeros(n_frames)

    dptr = ctypes.POINTER(ctypes.c_double)
    iptr = ctypes.POINTER(ctypes.c_int)
    failure = c_entry(
        tract.ctypes.data_as(dptr), glottis.ctypes.data_as(dptr),
        n_frames, FRAME_STEPS, audio.ctypes.data_as(dptr),
        tube_length.ctypes.data_as(dptr), tube_area.ctypes.data_as(dptr),
        tube_articulator_idx.ctypes.data_as(iptr),
        incisor.ctypes.data_as(dptr), tongue_tip.ctypes.data_as(dptr),
        velum.ctypes.data_as(dptr))
    if failure != 0:
        raise ValueError(
            f"Error in pts_speak_and_extract! Errorcode: {failure}")

    arti = np.vectorize(ARTICULATOR.get)(tube_articulator_idx)
    tube_info = {
        "tube_length_cm": tube_length,
        "tube_area_cm2": tube_area,
        "tube_articulator": arti,
        "incisor_pos_cm": incisor,
        "tongue_tip_side_elevation": tongue_tip,
        "velum_opening_cm2": velum,
    }
    return audio, SAMPLE_RATE, tube_info


def speak_and_extract_tube_information(cp_param):
    """Frame-by-frame synthesis with tube extraction on the default
    (global) synthesizer instance."""
    lib = _default()
    return _speak_and_extract_core(cp_param, lib.pts_speak_and_extract)


def tract_to_tube(tract_params):
    """Single-frame tube extraction from 19 tract params."""
    lib = _default()
    tract = _check_finite(
        np.ascontiguousarray(tract_params, dtype=np.float64), "tract_params")
    dptr = ctypes.POINTER(ctypes.c_double)
    iptr = ctypes.POINTER(ctypes.c_int)
    tl = np.zeros(N_TUBE_SECTIONS)
    ta = np.zeros(N_TUBE_SECTIONS)
    ai = np.zeros(N_TUBE_SECTIONS, dtype=np.int32)
    inc = ctypes.c_double(0)
    tt = ctypes.c_double(0)
    vel = ctypes.c_double(0)
    failure = lib.pts_tract_to_tube(
        tract.ctypes.data_as(dptr), tl.ctypes.data_as(dptr),
        ta.ctypes.data_as(dptr), ai.ctypes.data_as(iptr),
        ctypes.byref(inc), ctypes.byref(tt), ctypes.byref(vel))
    if failure != 0:
        raise ValueError(f"Error in pts_tract_to_tube! Errorcode: {failure}")
    return tl, ta, ai, inc.value, tt.value, vel.value


def synthesis_add_tube(n_samples, tube_areas, glottis, *, tube_lengths=None,
                       velum_opening_cm2=0.0):
    """Incremental synthesis directly from 40 tube-section areas (bypasses
    the tract model).  Returns the synthesized samples (empty on the first,
    state-installing call)."""
    lib = _default()
    areas = np.ascontiguousarray(tube_areas, dtype=np.float64)
    if areas.shape != (N_TUBE_SECTIONS,):
        raise ValueError(f"tube_areas must be ({N_TUBE_SECTIONS},)")
    _check_finite(areas, "tube_areas")
    if tube_lengths is None:
        lengths = np.full(N_TUBE_SECTIONS, 16.0 / N_TUBE_SECTIONS)
    else:
        lengths = _check_finite(
            np.ascontiguousarray(tube_lengths, dtype=np.float64),
            "tube_lengths")
    gl = _check_finite(
        np.ascontiguousarray(glottis, dtype=np.float64), "glottis")
    audio = np.zeros(max(n_samples, 1), dtype=np.float64)
    dptr = ctypes.POINTER(ctypes.c_double)
    failure = lib.pts_synthesis_add_tube(
        int(n_samples), audio.ctypes.data_as(dptr),
        areas.ctypes.data_as(dptr), lengths.ctypes.data_as(dptr),
        gl.ctypes.data_as(dptr), ctypes.c_double(velum_opening_cm2))
    if failure != 0:
        raise ValueError(f"Error in pts_synthesis_add_tube! Errorcode: {failure}")
    return audio[:n_samples]


def get_transfer_function(tract_params, n_points=1024):
    """Vocal-tract transfer function (magnitude, phase) at ``n_points``
    frequency bins up to Nyquist."""
    lib = _default()
    tract = _check_finite(
        np.ascontiguousarray(tract_params, dtype=np.float64), "tract_params")
    mag = np.zeros(n_points)
    ph = np.zeros(n_points)
    dptr = ctypes.POINTER(ctypes.c_double)
    failure = lib.pts_get_transfer_function(
        tract.ctypes.data_as(dptr), int(n_points),
        mag.ctypes.data_as(dptr), ph.ctypes.data_as(dptr))
    if failure != 0:
        raise ValueError(f"Error in pts_get_transfer_function! Errorcode: {failure}")
    return mag, ph


def input_tract_to_limited_tract(tract_params):
    """Clamp 19 tract params into the speaker's domain."""
    lib = _default()
    tract = np.ascontiguousarray(tract_params, dtype=np.float64)
    out = np.zeros_like(tract)
    dptr = ctypes.POINTER(ctypes.c_double)
    failure = lib.pts_input_tract_to_limited_tract(
        tract.ctypes.data_as(dptr), out.ctypes.data_as(dptr))
    if failure != 0:
        raise ValueError(f"Errorcode: {failure}")
    return out


def calc_tongue_root_automatically(tract_params):
    """Fill TRX/TRY from the tongue-body position (linear coupling)."""
    lib = _default()
    tract = np.ascontiguousarray(tract_params, dtype=np.float64).copy()
    dptr = ctypes.POINTER(ctypes.c_double)
    failure = lib.pts_calc_tongue_root_automatically(
        tract.ctypes.data_as(dptr))
    if failure != 0:
        raise ValueError(f"Errorcode: {failure}")
    return tract


def save_speaker(path):
    """Write the current speaker definition to a speaker file."""
    lib = _default()
    failure = lib.pts_save_speaker(str(path).encode())
    if failure != 0:
        raise ValueError(f"Error in pts_save_speaker! Errorcode: {failure}")


def ges_to_audio(ges_file, wav_file=None):
    """Render a gestural score to audio; optionally also write a WAV."""
    lib = _default()
    n = ctypes.c_int(0)
    # first call: query length only
    failure = lib.pts_gestural_score_to_audio(
        str(ges_file).encode(), b"", None, 0, ctypes.byref(n))
    if failure != 0:
        raise ValueError(
            f"Error in pts_gestural_score_to_audio! Errorcode: {failure}")
    audio = np.zeros(n.value, dtype=np.float64)
    dptr = ctypes.POINTER(ctypes.c_double)
    failure = lib.pts_gestural_score_to_audio(
        str(ges_file).encode(),
        str(wav_file).encode() if wav_file else b"",
        audio.ctypes.data_as(dptr), n.value, ctypes.byref(n))
    if failure != 0:
        raise ValueError(
            f"Error in pts_gestural_score_to_audio! Errorcode: {failure}")
    return audio, SAMPLE_RATE


def ges_to_ema_and_mesh(ges_file, file_prefix, *, path=""):
    """Render a gestural score directly to EMA + mesh files."""
    lib = _default()
    if path and not os.path.exists(path):
        os.makedirs(path, exist_ok=True)
    failure = lib.pts_gestural_score_to_ema_and_mesh(
        str(ges_file).encode(), str(path).encode(), str(file_prefix).encode())
    if failure != 0:
        raise ValueError(
            f"Error in pts_gestural_score_to_ema_and_mesh! "
            f"Errorcode: {failure}")


def export_svgs(cps, path="svgs/", hop_length=5):
    """Per-frame midsagittal SVG export (hop 5 ~ 80 fps, hop 16 ~ 25 fps)."""
    lib = _default()
    cps = np.ascontiguousarray(cps, dtype=np.float64)
    os.makedirs(path, exist_ok=True)
    dptr = ctypes.POINTER(ctypes.c_double)
    for ii in range(cps.shape[0] // hop_length):
        jj = ii * hop_length
        tract = np.ascontiguousarray(cps[jj, :N_TRACT])
        file_name = os.path.join(path, f"tract{ii:05d}.svg")
        lib.pts_export_tract_svg(
            tract.ctypes.data_as(dptr), file_name.encode())


def cps_to_ema_and_mesh(cps, file_prefix, *, path=""):
    """EMA trajectories + mesh export for a cp sequence (behavioral contract
    of /root/reference/paule/util.py:729-804)."""
    lib = _default()
    cps = _check_cp(cps)
    n_frames = cps.shape[0]
    tract = np.ascontiguousarray(cps[:, :N_TRACT])
    glottis = np.ascontiguousarray(cps[:, N_TRACT:])

    n_ema = 3
    surf = (ctypes.c_int * n_ema)(16, 16, 16)  # tongue surface
    vert = (ctypes.c_int * n_ema)(115, 225, 335)  # back / mid / tip

    if path and not os.path.exists(path):
        os.makedirs(path, exist_ok=True)

    dptr = ctypes.POINTER(ctypes.c_double)
    failure = lib.pts_tract_sequence_to_ema_and_mesh(
        tract.ctypes.data_as(dptr), glottis.ctypes.data_as(dptr),
        N_TRACT, N_GLOTTIS, n_frames, n_ema,
        ctypes.byref(surf), ctypes.byref(vert),
        str(path).encode(), str(file_prefix).encode())
    if failure != 0:
        raise ValueError(
            f"Error in pts_tract_sequence_to_ema_and_mesh! Errorcode: {failure}")


def cps_to_ema(cps):
    """EMA export returned as a pandas DataFrame."""
    import pandas as pd

    with tempfile.TemporaryDirectory(prefix="paule_tpu_") as path:
        file_name = "paule_tpu_ema_export"
        cps_to_ema_and_mesh(cps, file_prefix=file_name, path=path)
        emas = pd.read_table(os.path.join(path, f"{file_name}-ema.txt"), sep=" ")
    return emas


def read_cp(filename):
    """Parse a tract-sequence file into an unnormalized (n, 30) cp array
    (format contract of /root/reference/paule/util.py:149-172)."""
    with open(filename, "rt") as cp_file:
        for _ in range(6):
            cp_file.readline()
        glottis_model = cp_file.readline().strip()
        if glottis_model != "Geometric glottis":
            raise ValueError(
                f'glottis model is not "Geometric glottis" in file {filename}')
        n_states = int(cp_file.readline().strip())
        cp_param = np.zeros((n_states, N_CP))
        for ii, line in enumerate(cp_file):
            kk = ii // 2
            if kk >= n_states:
                raise ValueError(
                    f"more states saved in file {filename} than claimed")
            vals = np.fromstring(line.strip(), sep=" ")
            if ii % 2 == 0:
                cp_param[kk, N_TRACT:] = vals
            else:
                cp_param[kk, :N_TRACT] = vals
    return cp_param


def seg_to_cps(seg_file):
    """Segment file -> gestural score -> unnormalized cps."""
    lib = _default()
    with tempfile.TemporaryDirectory() as tmpdir:
        ges = os.path.join(tmpdir, "gestural_score.txt")
        failure = lib.pts_segment_sequence_to_gestural_score(
            str(seg_file).encode(), ges.encode())
        if failure != 0:
            raise ValueError(
                f"Error in pts_segment_sequence_to_gestural_score! "
                f"Errorcode: {failure}")
        cps = ges_to_cps(ges)
    return cps


def ges_to_cps(ges_file):
    """Gestural score file -> unnormalized cps."""
    lib = _default()
    with tempfile.TemporaryDirectory() as tmpdir:
        seq = os.path.join(tmpdir, "tract_sequence.txt")
        failure = lib.pts_gestural_score_to_tract_sequence(
            str(ges_file).encode(), seq.encode())
        if failure != 0:
            raise ValueError(
                f"Error in pts_gestural_score_to_tract_sequence! "
                f"Errorcode: {failure}")
        cps = read_cp(seq)
    return cps


def get_area_info_within_oral_cavity(tube_length, tube_area, *, cm_inside=7,
                                     calculate="min"):
    """Reduce 40 tube sections to per-cm oral-cavity features over the last
    ``cm_inside`` cm from the lips (behavioral contract of
    /root/reference/paule/util.py:890-933) — vectorized numpy, no per-frame
    Python loops over sections."""
    tube_length = np.asarray(tube_length)
    tube_area = np.asarray(tube_area)
    cum = np.cumsum(tube_length, axis=1)  # (T, 40)
    total = cum[:, -1:]  # (T, 1)
    n_sections = tube_area.shape[1]

    out = np.zeros((tube_area.shape[0], cm_inside))
    for j in range(cm_inside):
        lo = total - (cm_inside - j)
        hi = total - (cm_inside - j - 1)
        inside = (cum >= lo) & (cum <= hi)  # (T, 40)
        # include one more section to the right (partially overlapping)
        idx = np.arange(n_sections)[None, :]
        last_idx = np.where(inside, idx, -1).max(axis=1)
        extra = idx == np.minimum(last_idx + 1, n_sections - 1)[:, None]
        sel = inside | (extra & (last_idx >= 0)[:, None])
        if calculate == "min":
            vals = np.where(sel, tube_area, np.inf).min(axis=1)
        elif calculate == "mean":
            s = np.where(sel, tube_area, 0.0).sum(axis=1)
            c = np.maximum(sel.sum(axis=1), 1)
            vals = s / c
        elif calculate == "binary":
            vals = (np.where(sel, tube_area, np.inf) <= 0.001).any(axis=1)
        else:
            raise ValueError("calculate must be one of ['mean','binary','min']")
        out[:, j] = vals
    return out


class SynthPool:
    """Pool of independent synthesizer handles for concurrent host synthesis.

    Unlike the reference's single global VTL instance, each handle carries
    its own state, so a thread pool can synthesize different cp snapshots in
    parallel while the TPU keeps planning.
    """

    def __init__(self, size=2, speaker_path="default"):
        lib = _load()
        self._lib = lib
        self._handles = []
        self._free = []
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        for _ in range(size):
            h = lib.pts_create(str(speaker_path).encode())
            if not h:
                raise ValueError("pts_create failed")
            self._handles.append(h)
            self._free.append(h)

    def _acquire(self):
        with self._cond:
            while not self._free:
                self._cond.wait()
            return self._free.pop()

    def _release(self, h):
        with self._cond:
            self._free.append(h)
            self._cond.notify()

    def speak(self, cp_param):
        cp = _check_cp(cp_param)
        n_frames = cp.shape[0]
        audio = np.zeros(max(0, (n_frames - 1) * FRAME_STEPS), dtype=np.float64)
        tract = np.ascontiguousarray(cp[:, :N_TRACT])
        glottis = np.ascontiguousarray(cp[:, N_TRACT:])
        dptr = ctypes.POINTER(ctypes.c_double)
        h = self._acquire()
        try:
            failure = self._lib.pts_synth_block_h(
                ctypes.c_void_p(h),
                tract.ctypes.data_as(dptr), glottis.ctypes.data_as(dptr),
                n_frames, FRAME_STEPS, audio.ctypes.data_as(dptr))
            if failure != 0:
                raise ValueError(f"pts_synth_block_h failed: {failure}")
        finally:
            self._release(h)
        return audio, SAMPLE_RATE

    def speak_and_extract_tube_information(self, cp_param):
        """Handle-based, concurrency-safe variant of the module-level
        :func:`speak_and_extract_tube_information`."""
        h = self._acquire()
        try:
            hc = ctypes.c_void_p(h)
            return _speak_and_extract_core(
                cp_param,
                lambda *a: self._lib.pts_speak_and_extract_h(hc, *a))
        finally:
            self._release(h)

    def _acquire_all(self):
        """Take every handle (for a one-crossing batch call); blocks until
        all outstanding per-trajectory calls return."""
        with self._cond:
            while len(self._free) < len(self._handles):
                self._cond.wait()
            taken = list(self._free)
            self._free.clear()
            return taken

    def _release_all(self, handles):
        with self._cond:
            self._free.extend(handles)
            self._cond.notify_all()

    def _batch_core(self, cps_batch, with_tube):
        """Synthesize (B, T, 30) trajectories in ONE FFI crossing
        (pts_synth_block_batch); per-item error codes instead of raising,
        so one diverged snapshot doesn't abort its batch."""
        cps = np.ascontiguousarray(cps_batch, dtype=np.float64)
        if cps.ndim != 3 or cps.shape[2] != N_CP:
            raise ValueError(f"cps_batch must be (B, T, {N_CP}), "
                             f"got {cps.shape}")
        b, t = cps.shape[0], cps.shape[1]
        if b == 0 or t == 0:
            raise ValueError("empty batch")
        # per-item finite guard: the C core's branch-free fast-math assumes
        # finite inputs; bad items are zeroed (synthesized but discarded)
        # and flagged with error -1
        finite = np.isfinite(cps).all(axis=(1, 2))
        if not finite.all():
            cps = cps.copy()
            cps[~finite] = 0.0
        tract = np.ascontiguousarray(cps[:, :, :N_TRACT])
        glottis = np.ascontiguousarray(cps[:, :, N_TRACT:])
        audio = np.zeros((b, (t - 1) * FRAME_STEPS), dtype=np.float64)
        errors = np.zeros(b, dtype=np.int32)
        dptr = ctypes.POINTER(ctypes.c_double)
        iptr = ctypes.POINTER(ctypes.c_int)
        if with_tube:
            tube_length = np.zeros((b, t, N_TUBE_SECTIONS))
            tube_area = np.zeros((b, t, N_TUBE_SECTIONS))
            tube_articulator_idx = np.zeros((b, t, N_TUBE_SECTIONS),
                                            dtype=np.int32)
            incisor = np.zeros((b, t))
            tongue_tip = np.zeros((b, t))
            velum = np.zeros((b, t))
            extra = (tube_length.ctypes.data_as(dptr),
                     tube_area.ctypes.data_as(dptr),
                     tube_articulator_idx.ctypes.data_as(iptr),
                     incisor.ctypes.data_as(dptr),
                     tongue_tip.ctypes.data_as(dptr),
                     velum.ctypes.data_as(dptr))
        else:
            extra = (None,) * 6
        handles = self._acquire_all()
        try:
            harr = (ctypes.c_void_p * len(handles))(*handles)
            failure = self._lib.pts_synth_block_batch(
                harr, len(handles),
                tract.ctypes.data_as(dptr), glottis.ctypes.data_as(dptr),
                b, t, FRAME_STEPS, audio.ctypes.data_as(dptr),
                1 if with_tube else 0, *extra,
                errors.ctypes.data_as(iptr))
            if failure != 0:
                raise ValueError(f"pts_synth_block_batch failed: {failure}")
        finally:
            self._release_all(handles)
        errors = np.where(finite, errors, -1)
        if with_tube:
            tube_infos = [{
                "tube_length_cm": tube_length[i],
                "tube_area_cm2": tube_area[i],
                "tube_articulator":
                    np.vectorize(ARTICULATOR.get)(tube_articulator_idx[i]),
                "incisor_pos_cm": incisor[i],
                "tongue_tip_side_elevation": tongue_tip[i],
                "velum_opening_cm2": velum[i],
            } for i in range(b)]
            return audio, SAMPLE_RATE, errors, tube_infos
        return audio, SAMPLE_RATE, errors, None

    def speak_batch(self, cps_batch):
        """Block-synthesize B same-length trajectories in one native call.

        Returns ``(audio (B, (T-1)*110), 44100, errors (B,))``; errors[i]
        nonzero (or -1 for non-finite input) marks a failed item whose
        audio row is unreliable."""
        audio, sr, errors, _ = self._batch_core(cps_batch, with_tube=False)
        return audio, sr, errors

    def speak_and_extract_batch(self, cps_batch):
        """Batch variant of :meth:`speak_and_extract_tube_information`:
        one native crossing for B trajectories incl. tube extraction.
        Returns ``(audio, 44100, errors, [tube_info] * B)``."""
        return self._batch_core(cps_batch, with_tube=True)

    def close(self):
        with self._lock:
            for h in self._handles:
                self._lib.pts_destroy(ctypes.c_void_p(h))
            self._handles.clear()
            self._free.clear()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
