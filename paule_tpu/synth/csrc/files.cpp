// paule_tpu articulatory synthesizer — file-based pipelines:
// segment sequence -> gestural score -> tract sequence, SVG export,
// EMA/mesh export.  Formats are chosen for behavioral parity with the
// surface the reference Python layer consumes
// (/root/reference/paule/util.py:149-172, 542-561, 729-830, 833-887).

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstring>
#include <fstream>
#include <sstream>
#include <vector>

#include "model.h"

namespace pts {

namespace {

std::string trim(const std::string& s) {
  size_t a = s.find_first_not_of(" \t\r\n");
  size_t b = s.find_last_not_of(" \t\r\n");
  if (a == std::string::npos) return "";
  return s.substr(a, b - a + 1);
}

struct Gesture {
  std::string phone;
  double start_s, dur_s, tau_s;
  double f0 = -1.0;  // optional f0 override
};

int parse_gesture_file(const std::string& path, std::vector<Gesture>* out,
                       std::string* err) {
  std::ifstream fh(path);
  if (!fh) {
    if (err) *err = "cannot open gesture file: " + path;
    return 1;
  }
  std::string line;
  while (std::getline(fh, line)) {
    line = trim(line);
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ls(line);
    std::string kind;
    ls >> kind;
    if (kind != "phone") continue;
    Gesture g;
    ls >> g.phone;
    std::string kv;
    g.start_s = 0;
    g.dur_s = 0.1;
    g.tau_s = 0.015;
    while (ls >> kv) {
      auto eq = kv.find('=');
      if (eq == std::string::npos) continue;
      std::string key = kv.substr(0, eq);
      double val = std::stod(kv.substr(eq + 1));
      if (key == "start") g.start_s = val;
      else if (key == "dur") g.dur_s = val;
      else if (key == "tau") g.tau_s = val;
      else if (key == "f0") g.f0 = val;
    }
    out->push_back(g);
  }
  if (out->empty()) {
    if (err) *err = "no phone gestures in " + path;
    return 2;
  }
  return 0;
}

}  // namespace

int segment_file_to_gesture_file(const Speaker& spk, const std::string& seg,
                                 const std::string& ges, std::string* err) {
  std::ifstream fh(seg);
  if (!fh) {
    if (err) *err = "cannot open segment file: " + seg;
    return 1;
  }
  struct Seg {
    std::string name;
    double dur;
  };
  std::vector<Seg> segs;
  std::string line;
  while (std::getline(fh, line)) {
    line = trim(line);
    if (line.empty() || line[0] == '#') continue;
    if (line.find('=') != std::string::npos) {
      // VTL-style: "name = a; duration_s = 0.123;"
      std::string name;
      double dur = -1;
      std::istringstream ls(line);
      std::string tok;
      std::vector<std::string> toks;
      while (std::getline(ls, tok, ';')) toks.push_back(tok);
      for (auto& t : toks) {
        auto eq = t.find('=');
        if (eq == std::string::npos) continue;
        std::string key = trim(t.substr(0, eq));
        std::string val = trim(t.substr(eq + 1));
        if (key == "name") name = val;
        if (key == "duration_s") dur = std::stod(val);
      }
      if (!name.empty() && dur > 0) segs.push_back({name, dur});
    } else {
      // simple style: "phone duration"
      std::istringstream ls(line);
      Seg s;
      if (ls >> s.name >> s.dur) segs.push_back(s);
    }
  }
  if (segs.empty()) {
    if (err) *err = "no segments parsed from " + seg;
    return 2;
  }
  std::ofstream out(ges);
  if (!out) {
    if (err) *err = "cannot write gesture file: " + ges;
    return 3;
  }
  out << "# paule_tpu gestural score v1\n";
  double t = 0.0;
  for (auto& s : segs) {
    const Speaker::Phone* ph = spk.find_phone(s.name);
    double tau = ph ? ph->time_constant_s : 0.015;
    out << "phone " << (ph ? s.name : std::string("@")) << " start=" << t
        << " dur=" << s.dur << " tau=" << tau << "\n";
    t += s.dur;
  }
  return 0;
}

int gesture_file_to_states(const Speaker& spk, const std::string& ges,
                           std::vector<double>* states, std::string* err) {
  std::vector<Gesture> gestures;
  int rc = parse_gesture_file(ges, &gestures, err);
  if (rc != 0) return rc;

  double total_s = 0.0;
  for (auto& g : gestures) total_s = std::max(total_s, g.start_s + g.dur_s);
  const double dt = (double)kSamplesPerState / kAudioSampleRate;
  int n_states = std::max(2, (int)std::ceil(total_s / dt) + 1);

  // third-order critically-damped target approximation per parameter
  const int NP = kTractParams + kGlottisParams;
  std::vector<double> y1(NP), y2(NP), y3(NP);
  {
    const Speaker::Phone* ph0 = spk.find_phone(gestures[0].phone);
    for (int i = 0; i < NP; ++i) {
      double v = ph0 ? ph0->target[i]
                     : (i < kTractParams ? spk.tract_params[i].neutral
                                         : spk.glottis_params[i - kTractParams].neutral);
      y1[i] = y2[i] = y3[i] = v;
    }
  }
  states->assign((size_t)n_states * NP, 0.0);
  for (int s = 0; s < n_states; ++s) {
    double t = s * dt;
    // active gesture (last one whose window contains t)
    const Gesture* active = &gestures.back();
    for (auto& g : gestures)
      if (t >= g.start_s && t < g.start_s + g.dur_s) active = &g;
    const Speaker::Phone* ph = spk.find_phone(active->phone);
    double tau = std::max(active->tau_s, 1e-4);
    double alpha = 1.0 - std::exp(-dt / tau);
    for (int i = 0; i < NP; ++i) {
      double target = ph ? ph->target[i]
                         : (i < kTractParams
                                ? spk.tract_params[i].neutral
                                : spk.glottis_params[i - kTractParams].neutral);
      if (i == kTractParams && active->f0 > 0) target = active->f0;
      y1[i] += alpha * (target - y1[i]);
      y2[i] += alpha * (y1[i] - y2[i]);
      y3[i] += alpha * (y2[i] - y3[i]);
      (*states)[(size_t)s * NP + i] = y3[i];
    }
  }
  return 0;
}

int gesture_file_to_tract_sequence(const Speaker& spk, const std::string& ges,
                                   const std::string& seq, std::string* err) {
  std::vector<double> states;
  int rc = gesture_file_to_states(spk, ges, &states, err);
  if (rc != 0) return rc;
  const int NP = kTractParams + kGlottisParams;
  int n_states = (int)(states.size() / NP);

  std::ofstream out(seq);
  if (!out) {
    if (err) *err = "cannot write tract sequence file: " + seq;
    return 3;
  }
  // header: 6 comment lines, glottis model name, state count — the layout
  // the reference's read_cp parser expects
  out << "# paule_tpu tract sequence file\n";
  out << "# speaker: " << spk.name << "\n";
  out << "# sample period: 110 / 44100 s\n";
  out << "# lines alternate: glottis params (11), tract params (19)\n";
  out << "#\n";
  out << "#\n";
  out << "Geometric glottis\n";
  out << n_states << "\n";
  out.precision(10);
  for (int s = 0; s < n_states; ++s) {
    const double* st = states.data() + (size_t)s * NP;
    for (int i = 0; i < kGlottisParams; ++i)
      out << st[kTractParams + i] << (i + 1 < kGlottisParams ? " " : "\n");
    for (int i = 0; i < kTractParams; ++i)
      out << st[i] << (i + 1 < kTractParams ? " " : "\n");
  }
  return 0;
}

namespace {

// minimal 16-bit PCM WAV writer
int write_wav(const std::string& path, const std::vector<double>& audio,
              int sample_rate) {
  std::ofstream out(path, std::ios::binary);
  if (!out) return 1;
  auto w32 = [&](uint32_t v) { out.write((const char*)&v, 4); };
  auto w16 = [&](uint16_t v) { out.write((const char*)&v, 2); };
  uint32_t data_bytes = (uint32_t)audio.size() * 2;
  out.write("RIFF", 4);
  w32(36 + data_bytes);
  out.write("WAVE", 4);
  out.write("fmt ", 4);
  w32(16);
  w16(1);  // PCM
  w16(1);  // mono
  w32((uint32_t)sample_rate);
  w32((uint32_t)sample_rate * 2);
  w16(2);
  w16(16);
  out.write("data", 4);
  w32(data_bytes);
  for (double v : audio) {
    double c = v < -1.0 ? -1.0 : (v > 1.0 ? 1.0 : v);
    int16_t s = (int16_t)std::lround(c * 32767.0);
    out.write((const char*)&s, 2);
  }
  return 0;
}

}  // namespace

int gestural_score_to_audio(const Speaker& spk, const std::string& ges,
                            const std::string& wav_path,
                            std::vector<double>* audio_out,
                            std::string* err) {
  std::vector<double> states;
  int rc = gesture_file_to_states(spk, ges, &states, err);
  if (rc != 0) return rc;
  const int NP = kTractParams + kGlottisParams;
  int n_states = (int)(states.size() / NP);
  if (n_states < 2) return 4;

  // de-interleave into tract / glottis blocks
  std::vector<double> tract((size_t)n_states * kTractParams);
  std::vector<double> glottis((size_t)n_states * kGlottisParams);
  for (int s = 0; s < n_states; ++s) {
    for (int i = 0; i < kTractParams; ++i)
      tract[(size_t)s * kTractParams + i] = states[(size_t)s * NP + i];
    for (int i = 0; i < kGlottisParams; ++i)
      glottis[(size_t)s * kGlottisParams + i] =
          states[(size_t)s * NP + kTractParams + i];
  }
  std::vector<double> audio((size_t)(n_states - 1) * kSamplesPerState);
  Synthesizer synth(spk);
  rc = synth.synth_block(tract.data(), glottis.data(), n_states,
                         kSamplesPerState, audio.data());
  if (rc != 0) return rc;
  if (!wav_path.empty()) {
    rc = write_wav(wav_path, audio, kAudioSampleRate);
    if (rc != 0) {
      if (err) *err = "cannot write wav file: " + wav_path;
      return 5;
    }
  }
  if (audio_out) *audio_out = std::move(audio);
  return 0;
}

int gestural_score_to_ema_and_mesh(const Speaker& spk, const std::string& ges,
                                   const std::string& dir,
                                   const std::string& prefix,
                                   std::string* err) {
  std::vector<double> states;
  int rc = gesture_file_to_states(spk, ges, &states, err);
  if (rc != 0) return rc;
  const int NP = kTractParams + kGlottisParams;
  int n_states = (int)(states.size() / NP);
  std::vector<double> tract((size_t)n_states * kTractParams);
  std::vector<double> glottis((size_t)n_states * kGlottisParams);
  for (int s = 0; s < n_states; ++s) {
    for (int i = 0; i < kTractParams; ++i)
      tract[(size_t)s * kTractParams + i] = states[(size_t)s * NP + i];
    for (int i = 0; i < kGlottisParams; ++i)
      glottis[(size_t)s * kGlottisParams + i] =
          states[(size_t)s * NP + kTractParams + i];
  }
  const int surf[3] = {16, 16, 16};
  const int vert[3] = {115, 225, 335};
  return tract_seq_to_ema_and_mesh(spk, tract.data(), glottis.data(),
                                   n_states, 3, surf, vert, dir, prefix);
}

int export_tract_svg(const Speaker& spk, const double* tract,
                     const std::string& path) {
  Outline o;
  tract_to_outline(spk, tract, &o);
  std::ofstream out(path);
  if (!out) return 1;

  // map cm coordinates into a 768x768 view box (y grows downward in SVG)
  auto sx = [](double x) { return 80.0 + x * 48.0; };
  auto sy = [](double y) { return 700.0 - y * 48.0; };

  out << "<svg xmlns=\"http://www.w3.org/2000/svg\" width=\"768\" "
         "height=\"768\" viewBox=\"0 0 768 768\">\n";
  out << "<rect width=\"768\" height=\"768\" fill=\"white\"/>\n";
  auto polyline = [&](const std::vector<double>& xs,
                      const std::vector<double>& ys, const char* color,
                      double width) {
    out << "<polyline fill=\"none\" stroke=\"" << color
        << "\" stroke-width=\"" << width << "\" points=\"";
    for (size_t i = 0; i < xs.size(); ++i)
      out << sx(xs[i]) << "," << sy(ys[i]) << " ";
    out << "\"/>\n";
  };
  polyline(o.out_x, o.out_y, "#333333", 3.0);
  polyline(o.in_x, o.in_y, "#cc4444", 3.0);
  polyline(o.mid_x, o.mid_y, "#bbbbbb", 1.0);
  for (auto& sp : o.tongue_sensors)
    out << "<circle cx=\"" << sx(sp[0]) << "\" cy=\"" << sy(sp[1])
        << "\" r=\"5\" fill=\"#2266cc\"/>\n";
  out << "</svg>\n";
  return 0;
}

int tract_seq_to_ema_and_mesh(const Speaker& spk, const double* tract,
                              const double* /*glottis*/, int n_frames,
                              int n_ema, const int* surf, const int* vert,
                              const std::string& dir,
                              const std::string& prefix) {
  // EMA: one row per control frame with time + per-sensor xyz; readable via
  // pandas.read_table(sep=' ') like the reference expects
  std::string base = dir.empty() ? prefix : dir + "/" + prefix;
  std::ofstream ema(base + "-ema.txt");
  if (!ema) return 1;
  ema << "time";
  for (int k = 0; k < n_ema; ++k)
    ema << " sensor" << k << "_surf" << surf[k] << "_vert" << vert[k] << "_x"
        << " sensor" << k << "_surf" << surf[k] << "_vert" << vert[k] << "_y"
        << " sensor" << k << "_surf" << surf[k] << "_vert" << vert[k] << "_z";
  ema << "\n";
  ema.precision(8);

  std::ofstream mesh(base + "-mesh.obj");
  if (!mesh) return 2;
  mesh << "# paule_tpu tract mesh sequence (" << n_frames << " frames)\n";

  size_t vert_count = 0;
  for (int f = 0; f < n_frames; ++f) {
    Outline o;
    tract_to_outline(spk, tract + (size_t)f * kTractParams, &o);
    double t = (double)f * kSamplesPerState / kAudioSampleRate;
    ema << t;
    for (int k = 0; k < n_ema; ++k) {
      // vertex index selects a location on the tongue contour: the
      // reference uses vertices {115, 225, 335} of surface 16 (tongue) for
      // back/mid/tip — map the index range onto our tongue zone
      double rel = (vert && vert[k] > 0) ? (vert[k] % 450) / 450.0 : 0.5;
      int n = (int)o.in_x.size();
      int i = (int)std::round((0.45 + 0.45 * rel) * (n - 1));
      i = std::min(std::max(i, 0), n - 1);
      double lateral = 0.0;
      ema << " " << o.in_x[i] << " " << o.in_y[i] << " " << lateral;
    }
    ema << "\n";

    // mesh: a ring strip of the outer/inner walls per frame
    mesh << "o frame" << f << "\n";
    for (size_t i = 0; i < o.out_x.size(); ++i)
      mesh << "v " << o.out_x[i] << " " << o.out_y[i] << " 0\n";
    for (size_t i = 0; i < o.in_x.size(); ++i)
      mesh << "v " << o.in_x[i] << " " << o.in_y[i] << " 0\n";
    size_t n = o.out_x.size();
    for (size_t i = 0; i + 1 < n; ++i) {
      size_t a = vert_count + i + 1;           // outer i
      size_t b = vert_count + i + 2;           // outer i+1
      size_t c = vert_count + n + i + 1;       // inner i
      size_t d = vert_count + n + i + 2;       // inner i+1
      mesh << "f " << a << " " << b << " " << d << " " << c << "\n";
    }
    vert_count += 2 * n;
  }
  return 0;
}

}  // namespace pts
