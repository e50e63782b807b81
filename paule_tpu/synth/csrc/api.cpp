// paule_tpu articulatory synthesizer — C ABI.
//
// Two layers:
//   * handle-based calls (pts_create / pts_*_h / pts_destroy) — thread-safe
//     as long as each handle is used from one thread at a time; intended for
//     host-side synthesizer pools.
//   * a default-instance layer mirroring the call pattern of the reference's
//     VTL usage (global init at import, /root/reference/paule/util.py:29-41)
//     for drop-in ctypes use.
//
// All functions return 0 on success and a nonzero error code on failure.

#include <algorithm>
#include <cstring>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include "model.h"

using namespace pts;

namespace {

struct Instance {
  std::unique_ptr<Synthesizer> synth;
  std::string last_error;
};

Instance* as_inst(void* h) { return reinterpret_cast<Instance*>(h); }

std::mutex g_mutex;
std::unique_ptr<Instance> g_default;

Instance* default_inst() { return g_default.get(); }

}  // namespace

extern "C" {

// ----------------------------------------------------------------- handles

void* pts_create(const char* speaker_path) {
  std::string err;
  Speaker spk = Speaker::load(speaker_path ? speaker_path : "", &err);
  if (spk.name == "<error>") return nullptr;
  auto inst = new Instance();
  inst->synth = std::make_unique<Synthesizer>(std::move(spk));
  return inst;
}

void pts_destroy(void* h) { delete as_inst(h); }

int pts_reset_h(void* h) {
  if (!h) return 1;
  as_inst(h)->synth->reset();
  return 0;
}

int pts_synth_block_h(void* h, const double* tract, const double* glottis,
                      int n_frames, int frame_steps, double* audio) {
  if (!h) return 1;
  return as_inst(h)->synth->synth_block(tract, glottis, n_frames, frame_steps,
                                        audio);
}

int pts_add_tract_h(void* h, int n_samples, double* audio,
                    const double* tract, const double* glottis) {
  if (!h) return 1;
  return as_inst(h)->synth->add_tract(n_samples, audio, tract, glottis);
}

int pts_tract_to_tube_h(void* h, const double* tract, double* tube_length,
                        double* tube_area, int* articulator,
                        double* incisor_pos, double* tongue_tip_side,
                        double* velum_opening) {
  if (!h) return 1;
  Tube tube;
  tract_to_tube(as_inst(h)->synth->speaker(), tract, &tube);
  std::memcpy(tube_length, tube.length_cm.data(), sizeof(double) * kTubeSections);
  std::memcpy(tube_area, tube.area_cm2.data(), sizeof(double) * kTubeSections);
  std::memcpy(articulator, tube.articulator.data(), sizeof(int) * kTubeSections);
  *incisor_pos = tube.incisor_pos_cm;
  *tongue_tip_side = tube.tongue_tip_side_elevation;
  *velum_opening = tube.velum_opening_cm2;
  return 0;
}

// Whole-trajectory incremental synthesis + per-frame tube extraction in one
// call (the Python layer's frame loop made 2*T ctypes crossings; this is
// the hot path of the somatosensory planning variant).
int pts_speak_and_extract_h(void* h, const double* tract,
                            const double* glottis, int n_frames,
                            int frame_steps, double* audio,
                            double* tube_length, double* tube_area,
                            int* articulator, double* incisor_pos,
                            double* tongue_tip_side, double* velum_opening) {
  if (!h || n_frames < 1) return 1;
  Synthesizer* synth = as_inst(h)->synth.get();
  synth->reset();
  for (int i = 0; i < n_frames; ++i) {
    const double* tr = tract + (size_t)i * kTractParams;
    const double* gl = glottis + (size_t)i * kGlottisParams;
    int n_samples = (i == 0) ? 0 : frame_steps;
    double* out = (i == 0) ? nullptr
                           : audio + (size_t)(i - 1) * frame_steps;
    int failure = synth->add_tract(n_samples, out, tr, gl);
    if (failure != 0) return failure;
    Tube tube;
    synth->tube_for(tr, &tube);  // cache hit: synthesis just computed it
    std::memcpy(tube_length + (size_t)i * kTubeSections,
                tube.length_cm.data(), sizeof(double) * kTubeSections);
    std::memcpy(tube_area + (size_t)i * kTubeSections,
                tube.area_cm2.data(), sizeof(double) * kTubeSections);
    std::memcpy(articulator + (size_t)i * kTubeSections,
                tube.articulator.data(), sizeof(int) * kTubeSections);
    incisor_pos[i] = tube.incisor_pos_cm;
    tongue_tip_side[i] = tube.tongue_tip_side_elevation;
    velum_opening[i] = tube.velum_opening_cm2;
  }
  return 0;
}

// ----------------------------------------------------- default instance API

int pts_initialize(const char* speaker_path) {
  std::lock_guard<std::mutex> lock(g_mutex);
  std::string err;
  Speaker spk = Speaker::load(speaker_path ? speaker_path : "", &err);
  if (spk.name == "<error>") return 3;
  g_default = std::make_unique<Instance>();
  g_default->synth = std::make_unique<Synthesizer>(std::move(spk));
  return 0;
}

int pts_close() {
  std::lock_guard<std::mutex> lock(g_mutex);
  g_default.reset();
  return 0;
}

int pts_get_version(char* buf, int buf_len) {
  static const char* kVersion = "paule_tpu-synth 1.0 (2026)";
  if (!buf || buf_len <= 0) return 1;
  std::strncpy(buf, kVersion, buf_len - 1);
  buf[buf_len - 1] = '\0';
  return 0;
}

int pts_get_constants(int* audio_sampling_rate, int* n_tube_sections,
                      int* n_tract_params, int* n_glottis_params,
                      int* n_samples_per_state, double* internal_rate) {
  if (audio_sampling_rate) *audio_sampling_rate = kAudioSampleRate;
  if (n_tube_sections) *n_tube_sections = kTubeSections;
  if (n_tract_params) *n_tract_params = kTractParams;
  if (n_glottis_params) *n_glottis_params = kGlottisParams;
  if (n_samples_per_state) *n_samples_per_state = kSamplesPerState;
  if (internal_rate) *internal_rate = kInternalSampleRate;
  return 0;
}

static int param_info(const std::vector<ParamInfo>& tab, char* names,
                      int names_len, double* mins, double* maxs,
                      double* neutrals) {
  std::string joined;
  for (size_t i = 0; i < tab.size(); ++i) {
    joined += tab[i].name;
    if (i + 1 < tab.size()) joined += " ";
    if (mins) mins[i] = tab[i].min;
    if (maxs) maxs[i] = tab[i].max;
    if (neutrals) neutrals[i] = tab[i].neutral;
  }
  if (names && names_len > 0) {
    std::strncpy(names, joined.c_str(), names_len - 1);
    names[names_len - 1] = '\0';
  }
  return 0;
}

int pts_get_tract_param_info(char* names, int names_len, double* mins,
                             double* maxs, double* neutrals) {
  auto* inst = default_inst();
  if (!inst) return 1;
  return param_info(inst->synth->speaker().tract_params, names, names_len,
                    mins, maxs, neutrals);
}

int pts_get_glottis_param_info(char* names, int names_len, double* mins,
                               double* maxs, double* neutrals) {
  auto* inst = default_inst();
  if (!inst) return 1;
  return param_info(inst->synth->speaker().glottis_params, names, names_len,
                    mins, maxs, neutrals);
}

int pts_synthesis_reset() {
  auto* inst = default_inst();
  if (!inst) return 1;
  inst->synth->reset();
  return 0;
}

int pts_synth_block(const double* tract, const double* glottis, int n_frames,
                    int frame_steps, double* audio) {
  auto* inst = default_inst();
  if (!inst) return 1;
  return inst->synth->synth_block(tract, glottis, n_frames, frame_steps,
                                  audio);
}

int pts_synthesis_add_tract(int n_samples, double* audio, const double* tract,
                            const double* glottis) {
  auto* inst = default_inst();
  if (!inst) return 1;
  return inst->synth->add_tract(n_samples, audio, tract, glottis);
}

int pts_speak_and_extract(const double* tract, const double* glottis,
                          int n_frames, int frame_steps, double* audio,
                          double* tube_length, double* tube_area,
                          int* articulator, double* incisor_pos,
                          double* tongue_tip_side, double* velum_opening) {
  Instance* inst = default_inst();
  if (!inst) return 1;
  return pts_speak_and_extract_h(inst, tract, glottis, n_frames, frame_steps,
                                 audio, tube_length, tube_area, articulator,
                                 incisor_pos, tongue_tip_side, velum_opening);
}

int pts_tract_to_tube(const double* tract, double* tube_length,
                      double* tube_area, int* articulator,
                      double* incisor_pos, double* tongue_tip_side,
                      double* velum_opening) {
  auto* inst = default_inst();
  if (!inst) return 1;
  return pts_tract_to_tube_h(inst, tract, tube_length, tube_area, articulator,
                             incisor_pos, tongue_tip_side, velum_opening);
}

int pts_synthesis_add_tube(int n_samples, double* audio,
                           const double* tube_areas,
                           const double* tube_lengths, const double* glottis,
                           double velum_opening_cm2) {
  auto* inst = default_inst();
  if (!inst) return 1;
  return inst->synth->add_tube(n_samples, audio, tube_areas, tube_lengths,
                               glottis, velum_opening_cm2);
}

int pts_fast_tract_to_tube(const double* tract, double* tube_length,
                           double* tube_area, int* articulator,
                           double* incisor_pos, double* tongue_tip_side,
                           double* velum_opening) {
  // the geometric tract model is already closed-form; the "fast" variant is
  // the same computation (kept for API surface parity)
  return pts_tract_to_tube(tract, tube_length, tube_area, articulator,
                           incisor_pos, tongue_tip_side, velum_opening);
}

int pts_get_transfer_function(const double* tract, int n_points,
                              double* magnitude, double* phase) {
  auto* inst = default_inst();
  if (!inst) return 1;
  if (n_points <= 0) return 2;
  tract_transfer_function(inst->synth->speaker(), tract, n_points, magnitude,
                          phase);
  return 0;
}

int pts_input_tract_to_limited_tract(const double* tract_in,
                                     double* tract_out) {
  auto* inst = default_inst();
  if (!inst) return 1;
  input_tract_to_limited_tract(inst->synth->speaker(), tract_in, tract_out);
  return 0;
}

int pts_calc_tongue_root_automatically(double* tract) {
  auto* inst = default_inst();
  if (!inst) return 1;
  calc_tongue_root_automatically(inst->synth->speaker(), tract);
  return 0;
}

int pts_save_speaker(const char* path) {
  auto* inst = default_inst();
  if (!inst) return 1;
  return save_speaker(inst->synth->speaker(), path ? path : "");
}

int pts_gestural_score_to_audio(const char* ges_path, const char* wav_path,
                                double* audio, int max_samples,
                                int* n_samples) {
  auto* inst = default_inst();
  if (!inst) return 1;
  std::string err;
  std::vector<double> buf;
  int rc = gestural_score_to_audio(inst->synth->speaker(),
                                   ges_path ? ges_path : "",
                                   wav_path ? wav_path : "", &buf, &err);
  if (rc != 0) return rc;
  if (n_samples) *n_samples = (int)buf.size();
  if (audio && max_samples > 0) {
    int n = std::min((int)buf.size(), max_samples);
    std::memcpy(audio, buf.data(), sizeof(double) * n);
  }
  return 0;
}

int pts_gestural_score_to_ema_and_mesh(const char* ges_path, const char* dir,
                                       const char* prefix) {
  auto* inst = default_inst();
  if (!inst) return 1;
  std::string err;
  return gestural_score_to_ema_and_mesh(
      inst->synth->speaker(), ges_path ? ges_path : "", dir ? dir : "",
      prefix ? prefix : "out", &err);
}

int pts_export_tract_svg(const double* tract, const char* path) {
  auto* inst = default_inst();
  if (!inst) return 1;
  return export_tract_svg(inst->synth->speaker(), tract, path ? path : "");
}

int pts_segment_sequence_to_gestural_score(const char* seg_path,
                                           const char* ges_path) {
  auto* inst = default_inst();
  if (!inst) return 1;
  std::string err;
  return segment_file_to_gesture_file(inst->synth->speaker(),
                                      seg_path ? seg_path : "",
                                      ges_path ? ges_path : "", &err);
}

int pts_gestural_score_to_tract_sequence(const char* ges_path,
                                         const char* seq_path) {
  auto* inst = default_inst();
  if (!inst) return 1;
  std::string err;
  return gesture_file_to_tract_sequence(inst->synth->speaker(),
                                        ges_path ? ges_path : "",
                                        seq_path ? seq_path : "", &err);
}

int pts_tract_sequence_to_ema_and_mesh(const double* tract,
                                       const double* glottis,
                                       int n_tract_params,
                                       int n_glottis_params, int n_frames,
                                       int n_ema, const int* surf,
                                       const int* vert, const char* path,
                                       const char* prefix) {
  auto* inst = default_inst();
  if (!inst) return 1;
  if (n_tract_params != kTractParams || n_glottis_params != kGlottisParams)
    return 2;
  return tract_seq_to_ema_and_mesh(inst->synth->speaker(), tract, glottis,
                                   n_frames, n_ema, surf, vert,
                                   path ? path : "", prefix ? prefix : "out");
}

// ------------------------------------------------------------ batch entry

// Synthesize a BATCH of same-length trajectories in ONE FFI crossing,
// optionally with per-frame tube extraction — the planner logs L snapshots
// per outer iteration and previously paid the Python/ctypes/executor
// round-trip L times (the reference pays 1 eager call per snapshot,
// /root/reference/paule/paule.py:1065-1099).  Work is spread across the
// provided handles with std::thread (each handle serves the trajectory
// indices congruent to its position); on a single-core host n_handles=1
// still collapses L crossings into one.
//
// Per-item error codes land in errors[b] (0 = ok); the return value is
// nonzero only for malformed arguments, so one diverged snapshot does not
// abort its batch (the Python layer's synthesis_error='skip' policy).
int pts_synth_block_batch(void** handles, int n_handles,
                          const double* tract,    // (B, T, 19)
                          const double* glottis,  // (B, T, 11)
                          int batch, int n_frames, int frame_steps,
                          double* audio,          // (B, (T-1)*steps)
                          int with_tube,
                          double* tube_length,    // (B, T, 40) or null
                          double* tube_area,      // (B, T, 40) or null
                          int* articulator,       // (B, T, 40) or null
                          double* incisor_pos,    // (B, T) or null
                          double* tongue_tip_side,  // (B, T) or null
                          double* velum_opening,  // (B, T) or null
                          int* errors) {          // (B,)
  if (!handles || n_handles < 1 || batch < 1 || n_frames < 1) return 1;
  for (int k = 0; k < n_handles; ++k)
    if (!handles[k]) return 1;
  if (with_tube && (!tube_length || !tube_area || !articulator ||
                    !incisor_pos || !tongue_tip_side || !velum_opening))
    return 1;
  const size_t traj_tract = (size_t)n_frames * kTractParams;
  const size_t traj_glottis = (size_t)n_frames * kGlottisParams;
  const size_t traj_audio = (size_t)(n_frames - 1) * frame_steps;
  const size_t traj_tube = (size_t)n_frames * kTubeSections;

  auto worker = [&](int k) {
    Synthesizer* synth = as_inst(handles[k])->synth.get();
    for (int b = k; b < batch; b += n_handles) {
      const double* tr = tract + (size_t)b * traj_tract;
      const double* gl = glottis + (size_t)b * traj_glottis;
      double* au = audio + (size_t)b * traj_audio;
      if (with_tube) {
        errors[b] = pts_speak_and_extract_h(
            handles[k], tr, gl, n_frames, frame_steps, au,
            tube_length + (size_t)b * traj_tube,
            tube_area + (size_t)b * traj_tube,
            articulator + (size_t)b * traj_tube,
            incisor_pos + (size_t)b * n_frames,
            tongue_tip_side + (size_t)b * n_frames,
            velum_opening + (size_t)b * n_frames);
      } else {
        synth->reset();
        errors[b] = synth->synth_block(tr, gl, n_frames, frame_steps, au);
      }
    }
  };

  int n_threads = std::min(n_handles, batch);
  if (n_threads <= 1) {
    worker(0);
  } else {
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (int k = 0; k < n_threads; ++k) threads.emplace_back(worker, k);
    for (auto& t : threads) t.join();
  }
  return 0;
}

}  // extern "C"
