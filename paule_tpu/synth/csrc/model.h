// paule_tpu articulatory synthesizer — core model declarations.
//
// A from-scratch C++ articulatory/tube synthesizer providing the functional
// surface the paule planning stack needs (behavioral equivalent of the
// VocalTractLab C API used at /root/reference/paule/util.py:175-433):
//
//   * geometric vocal-tract model: 19 control parameters -> 40-section tube
//     (lengths, areas, articulator labels) + incisor position, tongue-tip
//     side elevation, velum opening
//   * kinematic "geometric glottis": 11 control parameters -> per-sample
//     glottal source (area/flow) with flutter, double pulsing, skewness,
//     chink leakage and aspiration noise
//   * time-domain acoustics: Kelly-Lochbaum scattering waveguide over the
//     tube sections with a nasal side branch, wall damping, lip radiation
//     and constriction (frication) noise, running at 44100 Hz
//
// Everything is instance-state (no globals): the C ABI in api.cpp layers a
// default instance on top for drop-in ctypes use plus handle-based calls for
// thread-pooled synthesis.

#pragma once

#include <array>
#include <cstdint>
#include <string>
#include <vector>

namespace pts {

constexpr int kAudioSampleRate = 44100;
constexpr int kTubeSections = 40;
constexpr int kTractParams = 19;
constexpr int kGlottisParams = 11;
constexpr int kSamplesPerState = 110;  // 2.5 ms control frame
constexpr double kInternalSampleRate = 44100.0;

// articulator labels per tube section (matches the reference's mapping,
// /root/reference/paule/util.py:84-90)
enum Articulator : int {
  kVocalFolds = 0,
  kTongue = 1,
  kLowerIncisors = 2,
  kLowerLip = 3,
  kOtherArticulator = 4,
};

struct ParamInfo {
  std::string name;
  std::string description;
  std::string unit;
  double min, max, neutral;
};

struct Speaker {
  std::string name = "default";
  std::vector<ParamInfo> tract_params;    // 19
  std::vector<ParamInfo> glottis_params;  // 11
  // anatomy scalars
  double base_length_cm = 16.0;
  double fold_length_cm = 1.4;
  double nasal_length_cm = 11.4;
  // tract-map coefficients: how strongly each tongue articulator's
  // proximity closes the sagittal distance, and how far the lip blend
  // follows the LD aperture.  Defaults reproduce the builtin geometry
  // bit-for-bit; speaker files may override them ([tract_map] section)
  // so an imported speaker's formant SPACE — not just its scale — can be
  // calibrated against measured acoustics (docs/speakers.md).
  struct TractMap {
    double gain_body = 1.60, exp_body = 3.0;
    double gain_blade = 1.50, exp_blade = 2.0;
    double gain_tip = 1.30, exp_tip = 2.0;
    double gain_root = 0.70, exp_root = 2.0;
    double lip_factor = 0.8;
  } tract_map;
  // optional FITTED tube map ([tract_affine] section): per-section
  // log-area as an affine(+quadratic) function of the 19 tract params,
  // fitted at import time against an external tract model's area
  // functions (e.g. VTL's vtlTractToTube ground truth —
  // speaker_import.fit_tract_affine).  Empty -> the geometric model
  // above.  Row layout: [b, w_0..w_18] (20 coeffs, affine) or
  // [b, w_0..w_18, v_0..v_18] (39 coeffs, + squared features).
  struct TractAffine {
    int n_coef = 0;                 // 0 = absent; else 20 or 39
    std::vector<double> area;       // kTubeSections * n_coef (log-area)
    std::vector<double> length;     // n_coef (total length, cm) or empty
    std::vector<double> incisor;    // n_coef or empty
    std::vector<double> tongue_tip; // n_coef or empty
    std::vector<double> velum;      // n_coef or empty
    bool present() const {
      return n_coef > 0 &&
             (int)area.size() == kTubeSections * n_coef;
    }
  } tract_affine;
  // optional per-speaker glottal SOURCE calibration ([source] section):
  // the audio-level counterpart of [tract_affine].  A fitted tube map
  // makes the tract transfer function match an external model, but the
  // radiated audio still carries OUR kinematic glottis' spectrum; when a
  // speaker is imported from a synthesizer with a different source (e.g.
  // VTL's two-mass-like models), audio-domain formant estimates (LPC)
  // are biased by the source's spectral tilt even with a perfect tract
  // (measured: r4 imported-JD3 audio F1 13-36% low with TF F1 within
  // 0.6%).  Fitted at import time against the external synthesizer's
  // audio of sustained phones (speaker_import.fit_source).
  struct SourceCal {
    // mix of the flow derivative into the source signal:
    //   y[n] = u[n] + deriv_mix * kSourceDerivNorm * (u[n] - u[n-1])
    // (kSourceDerivNorm makes deriv_mix ~1 contribute comparable energy
    // at 500 Hz; >0 tilts the source spectrum up / brightens)
    double deriv_mix = 0.0;
    // added to the oscillation asymmetry exponent (sharper closure =
    // richer harmonics); applied on top of the PS control param
    double skew_offset = 0.0;
    // aspiration gain adjustment in dB on top of the AS control param
    double aspiration_db = 0.0;
    bool present() const {
      return deriv_mix != 0.0 || skew_offset != 0.0 || aspiration_db != 0.0;
    }
  } source;
  // phone target table: phone -> 30 parameter targets
  struct Phone {
    std::string name;
    std::array<double, kTractParams + kGlottisParams> target;
    bool voiced = true;
    double time_constant_s = 0.015;
  };
  std::vector<Phone> phones;

  static Speaker load(const std::string& path, std::string* err);
  static Speaker builtin_default();
  const Phone* find_phone(const std::string& name) const;
  void clamp_tract(double* p) const;
};

// tube description produced by the tract model
struct Tube {
  std::array<double, kTubeSections> length_cm;
  std::array<double, kTubeSections> area_cm2;
  std::array<int, kTubeSections> articulator;
  double incisor_pos_cm;
  double tongue_tip_side_elevation;
  double velum_opening_cm2;
  double total_length_cm;
};

// midsagittal outline for SVG/EMA export: (x, y) cm coordinates along the
// tract from glottis to lips, outer wall and inner (tongue/jaw) wall
struct Outline {
  std::vector<double> mid_x, mid_y;      // midline
  std::vector<double> out_x, out_y;      // outer wall
  std::vector<double> in_x, in_y;        // inner wall
  // virtual tongue landmark positions (back, mid, tip) in cm, 3-D (z=0 plane
  // plus lateral coordinate from tongue-side params)
  std::array<std::array<double, 3>, 3> tongue_sensors;
};

// 19 tract parameters -> tube + outline
void tract_to_tube(const Speaker& spk, const double* tract, Tube* tube);
void tract_to_outline(const Speaker& spk, const double* tract, Outline* out);

// Audio-rate / control-rate split: glottis params and tube geometry change
// slowly (the cp frame is 110 samples, and within a frame they lerp), so the
// expensive derived quantities (flutter sines, scattering coefficients,
// divisions, libm calls) are committed once per control block
// (kControlBlock samples) by prepare()/set_tube(), and the per-sample
// step() only runs the recurrences.
constexpr int kControlBlock = 8;

// kinematic glottis state
struct GlottisState {
  double phase = 0.0;
  uint32_t pulse_index = 0;
  uint32_t noise_state = 0x9e3779b9u;
  double asp_lp = 0.0;  // aspiration noise lowpass state
  void reset();
  // control-rate: commit (possibly interpolated) glottis params for a block
  void prepare(const Speaker& spk, const double* glottis);
  // audio-rate: advance one sample; returns glottal volume velocity
  // (arbitrary consistent units)
  double step(double* area_out);
  // audio-rate, batched: advance n (<= kControlBlock) samples into out.
  // Same per-sample math as step() restructured into branch-free array
  // loops so the oscillator chain (pow, sin^2) vectorizes; the only
  // intentional deviation is an inaudible phase floor (osc(p<5e-4) ~ 1e-10
  // instead of reaching exactly 0), which keeps the pow chain in the
  // no-underflow domain.
  void step_block(int n, double* out);
  // convenience: prepare + one sample (analysis paths)
  double step(const Speaker& spk, const double* glottis, double* area_out) {
    prepare(spk, glottis);
    return step(area_out);
  }

 private:
  // cached per control block
  double f0_eff_ = 0.0, skew_ = 1.6, lag_phase_ = 0.0, amp_ = 0.0;
  double xb_ = 0.0, xt_ = 0.0, chink_ = 0.0, dp_ = 0.0;
  double fold2_ = 2.0, u_coeff_ = 0.0, asp_gain13_ = 0.0;
  // per-speaker source calibration (Speaker::SourceCal, committed by
  // prepare(); deriv_k_ == 0 keeps the uncalibrated path bit-identical)
  double deriv_k_ = 0.0;
  double u_prev_ = 0.0;  // source output recurrence for the derivative mix
};

//: normalizes SourceCal::deriv_mix so a mix of 1 contributes energy equal
//: to the flow's at 500 Hz (derivative gain at f is ~2*pi*f/fs)
constexpr double kSourceDerivNorm = kInternalSampleRate / (2.0 * 3.14159265358979323846 * 500.0);

// Kelly-Lochbaum waveguide over the tube sections + nasal branch
class Waveguide {
 public:
  void reset();
  // control-rate: commit the tube geometry (section count, areas,
  // scattering coefficients, lip reflection, nasal port, frication site)
  void set_tube(const Tube& tube);
  // ramped control-rate path: install the two endpoint tubes of a ramp
  // segment once, then commit interpolated geometry per control block with
  // blend(a).  Equivalent to set_tube(lerp(t0, t1, a)) but hoists the
  // endpoint bookkeeping (length totals, spatial resampling grid) out of
  // the per-block work: blend() is O(M) lerps + the unavoidable
  // scattering divisions, with the 40->M resample recomputed only when
  // the quantized section count M actually changes along the ramp.
  void set_ramp(const Tube& t0, const Tube& t1);
  void blend(double a);
  // audio-rate: one output sample from the glottal flow
  double step(double glottal_flow);
  // audio-rate, batched: n samples with the committed coefficients.  Same
  // math as step() in a single loop, so the scalar filter states (lip /
  // nose / frication / radiation) live in registers across the block
  // instead of round-tripping through members every sample.
  void step_block(int n, const double* flows, double* out);
  // convenience: set_tube + one sample (analysis paths)
  double step(const Tube& tube, double glottal_flow, double /*seed*/) {
    set_tube(tube);
    return step(glottal_flow);
  }

 private:
  // ping-pong wave buffers: step() reads [cur_] and writes [cur_ ^ 1]
  // then flips, instead of staging into stack arrays and memcpy-ing back
  // (two 320-byte copies per audio sample)
  static constexpr int kNasalSections = 14;
  std::array<std::array<double, kTubeSections>, 2> fbuf_{}, bbuf_{};
  std::array<std::array<double, kNasalSections>, 2> nfbuf_{}, nbbuf_{};
  int cur_ = 0;
  double lip_lp_ = 0.0, lip_out_prev_ = 0.0, radiated_prev_ = 0.0;
  double nose_lp_ = 0.0;
  double fric_lp_ = 0.0;
  uint32_t noise_state_ = 0x2545f491u;
  // cached per control block (set_tube)
  int M_ = kTubeSections;
  double A_[kTubeSections] = {0};
  double k_[kTubeSections] = {0};
  double nk_[kNasalSections] = {0};
  double src_scale_ = 0.0, lip_refl_ = -0.9;
  int iv_ = 0;
  double a_port_ = 0.0;
  double port_scale_ = 0.0;  // 2 / (sum of 3-port admittances)
  int fric_i_ = 0;
  double fric_amp_ = 0.0;  // 0 when no narrow constriction
  bool nasal_k_ready_ = false;
  int nasal_cooldown_ = 0;  // samples of residual-decay after port closure
  // ramp endpoint cache (set_ramp/blend)
  double e0_area_[kTubeSections] = {0}, e1_area_[kTubeSections] = {0};
  double rA0_[kTubeSections] = {0}, rA1_[kTubeSections] = {0};
  double total0_ = 0.0, total1_ = 0.0, velum0_ = 0.0, velum1_ = 0.0;
  int ramp_M_ = -1;  // grid the rA* arrays are resampled on (-1 = stale)
  // shared by set_tube and blend: commit coefficients from A_[0..M) +
  // the nasal port opening
  void commit_(int M, double a_port);
};

// full synthesizer instance: owns speaker, interpolation state and engine
class Synthesizer {
 public:
  explicit Synthesizer(Speaker spk) : speaker_(std::move(spk)) { reset(); }

  const Speaker& speaker() const { return speaker_; }

  void reset();

  // vtlSynthBlock equivalent: n_frames states at frame_steps sample spacing,
  // writes (n_frames - 1) * frame_steps samples into audio
  int synth_block(const double* tract, const double* glottis, int n_frames,
                  int frame_steps, double* audio);

  // vtlSynthesisAddTract equivalent: ramp from the current state to the
  // given state over n_samples (n_samples == 0 just installs the state)
  int add_tract(int n_samples, double* audio, const double* tract,
                const double* glottis);

  // vtlSynthesisAddTube equivalent: synthesize directly from tube areas
  // (bypasses the tract model), ramping from the current tube state
  int add_tube(int n_samples, double* audio, const double* tube_areas,
               const double* tube_lengths, const double* glottis,
               double velum_opening_cm2);

  // tract->tube through the ramp cache: tube extraction right after
  // add_tract(tract) reuses the tube that synthesis just computed, and
  // primes the cache for the next ramp otherwise
  void tube_for(const double* tract, Tube* out);

 private:
  void synth_ramp(const double* tract0, const double* glottis0,
                  const double* tract1, const double* glottis1, int n,
                  double* audio);

  Speaker speaker_;
  Waveguide wg_;
  GlottisState glottis_state_;
  bool has_state_ = false;
  std::array<double, kTractParams> cur_tract_{};
  std::array<double, kGlottisParams> cur_glottis_{};
  bool has_tube_state_ = false;
  Tube cur_tube_{};
  // tract->tube cache: the ramp start tract of frame f equals the ramp end
  // tract of frame f-1, so each frame needs only ONE tract_to_tube call
  // (it is libm-heavy).  Keyed on the exact tract bytes for safety.
  bool ramp_cache_valid_ = false;
  std::array<double, kTractParams> ramp_cache_tract_{};
  Tube ramp_cache_tube_{};
};

// vocal-tract transfer function: magnitude/phase of the tube's frequency
// response (glottis volume-velocity -> lip output) at n_points bins up to
// Nyquist, measured from the waveguide's impulse response
void tract_transfer_function(const Speaker& spk, const double* tract,
                             int n_points, double* magnitude, double* phase);

// clamp tract parameters into the speaker's domain (in place)
void input_tract_to_limited_tract(const Speaker& spk, const double* in,
                                  double* out);

// derive tongue-root parameters (TRX/TRY) from the tongue-body position via
// the speaker's linear coupling (automatic tongue root)
void calc_tongue_root_automatically(const Speaker& spk, double* tract);

int save_speaker(const Speaker& spk, const std::string& path);

// ---------------------------------------------------------------------------
// file-based pipelines (files.cpp)
// ---------------------------------------------------------------------------

// parse a segment-sequence file (either "name = X; duration_s = Y;" pairs in
// the VTL style or simple "phone duration" lines) into a gestural score file
int segment_file_to_gesture_file(const Speaker& spk, const std::string& seg,
                                 const std::string& ges, std::string* err);

// render a gestural score into a tract-sequence file (text format readable
// by the reference's read_cp parser, /root/reference/paule/util.py:149-172)
int gesture_file_to_tract_sequence(const Speaker& spk, const std::string& ges,
                                   const std::string& seq, std::string* err);

// gestural score straight to cps in memory
int gesture_file_to_states(const Speaker& spk, const std::string& ges,
                           std::vector<double>* states, std::string* err);

int export_tract_svg(const Speaker& spk, const double* tract,
                     const std::string& path);

// render a gestural score to audio (WAV written to wav_path when non-empty;
// samples also returned via *audio_out)
int gestural_score_to_audio(const Speaker& spk, const std::string& ges,
                            const std::string& wav_path,
                            std::vector<double>* audio_out, std::string* err);

// render a gestural score directly to EMA (and optionally mesh) files
int gestural_score_to_ema_and_mesh(const Speaker& spk, const std::string& ges,
                                   const std::string& dir,
                                   const std::string& prefix,
                                   std::string* err);

int tract_seq_to_ema_and_mesh(const Speaker& spk, const double* tract,
                              const double* glottis, int n_frames, int n_ema,
                              const int* surf, const int* vert,
                              const std::string& dir,
                              const std::string& prefix);

}  // namespace pts
