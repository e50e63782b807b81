// paule_tpu articulatory synthesizer — core model implementation.
// See model.h for the design overview.

#include "model.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <fstream>
#include <sstream>

#include "fastmath.h"

#if defined(__SSE2__) || defined(_M_X64)
#include <xmmintrin.h>
#define PTS_HAVE_SSE 1
#endif

namespace pts {

namespace {

// Flush-to-zero/denormals-are-zero for the synthesis hot loops: the damped
// waveguide recurrences decay residual wave components through the denormal
// range, where x86 FP traps to microcode (10-100x per op).  Audibly the
// flushed values are ~1e-308.  RAII-restored so callers' (numpy's) FP
// environment is untouched.
struct ScopedFtz {
#if defined(PTS_HAVE_SSE)
  unsigned int saved_;
  ScopedFtz() : saved_(_mm_getcsr()) { _mm_setcsr(saved_ | 0x8040u); }
  ~ScopedFtz() { _mm_setcsr(saved_); }
#endif
};

double clampd(double v, double lo, double hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

double gauss(double x, double c, double w) {
  double z = (x - c) / w;
  return fast_exp(-0.5 * z * z);
}

double lerp(double a, double b, double t) { return a + (b - a) * t; }

// piecewise-linear profile evaluation over anchor arrays
double profile(const double* xs, const double* ys, int n, double x) {
  if (x <= xs[0]) return ys[0];
  for (int i = 1; i < n; ++i) {
    if (x <= xs[i]) {
      double t = (x - xs[i - 1]) / (xs[i] - xs[i - 1]);
      return lerp(ys[i - 1], ys[i], t);
    }
  }
  return ys[n - 1];
}

// xorshift32 white noise in [-1, 1]
double white(uint32_t* s) {
  uint32_t x = *s;
  x ^= x << 13;
  x ^= x >> 17;
  x ^= x << 5;
  *s = x;
  return (double)(int32_t)x / 2147483648.0;
}

}  // namespace

// ---------------------------------------------------------------------------
// Speaker
// ---------------------------------------------------------------------------

static ParamInfo P(const char* n, const char* d, const char* u, double mn,
                   double mx, double ne) {
  return ParamInfo{n, d, u, mn, mx, ne};
}

Speaker Speaker::builtin_default() {
  Speaker s;
  s.tract_params = {
      P("HX", "Hyoid position (horz.)", "cm", 0.0, 1.0, 1.0),
      P("HY", "Hyoid position (vert.)", "cm", -6.0, -3.5, -4.75),
      P("JX", "Jaw position (horz.)", "cm", -0.5, 0.0, 0.0),
      P("JA", "Jaw angle", "deg", -7.0, 0.0, -2.0),
      P("LP", "Lip protrusion", "cm", -1.0, 1.0, -0.07),
      P("LD", "Lip distance", "cm", -2.0, 4.0, 0.95),
      P("VS", "Velum shape", "", 0.0, 1.0, 0.0),
      P("VO", "Velum opening", "cm^2", -0.1, 1.0, -0.1),
      P("TCX", "Tongue body (horz.)", "cm", -3.0, 4.0, -0.4),
      P("TCY", "Tongue body (vert.)", "cm", -3.0, 1.0, -1.46),
      P("TTX", "Tongue tip (horz.)", "cm", 1.5, 5.5, 3.5),
      P("TTY", "Tongue tip (vert.)", "cm", -3.0, 2.5, -1.0),
      P("TBX", "Tongue blade (horz.)", "cm", -3.0, 4.0, 2.0),
      P("TBY", "Tongue blade (vert.)", "cm", -3.0, 5.0, 0.5),
      P("TRX", "Tongue root (horz.)", "cm", -4.0, 2.0, 0.0),
      P("TRY", "Tongue root (vert.)", "cm", -6.0, 0.0, 0.0),
      P("TS1", "Tongue side elevation 1", "", 0.0, 1.0, 0.0),
      P("TS2", "Tongue side elevation 2", "", 0.0, 1.0, 0.0),
      P("TS3", "Tongue side elevation 3", "", -1.0, 1.0, 0.0),
  };
  s.glottis_params = {
      P("F0", "Fundamental frequency", "Hz", 40.0, 600.0, 120.0),
      P("PR", "Subglottal pressure", "Pa", 0.0, 20000.0, 8000.0),
      P("XB", "Lower fold displacement", "cm", -0.05, 0.30, 0.02),
      P("XT", "Upper fold displacement", "cm", -0.05, 0.30, 0.02),
      P("CA", "Chink area", "cm^2", -0.25, 0.25, 0.02),
      P("LAG", "Phase lag", "rad", 0.0, 3.1415, 1.5708),
      P("RA", "Relative amplitude", "", -1.0, 1.0, 1.0),
      P("DP", "Double pulsing", "", 0.0, 1.0, 0.05),
      P("PS", "Pulse skewness", "", -0.5, 0.5, 0.0),
      P("FL", "Flutter", "%", 0.0, 100.0, 25.0),
      P("AS", "Aspiration strength", "dB", -40.0, 0.0, -40.0),
  };

  // phone target inventory for the segment/gesture pipeline: neutral values
  // everywhere, with the distinguishing articulations set per phone
  auto base = [&]() {
    std::array<double, 30> t{};
    for (int i = 0; i < kTractParams; ++i) t[i] = s.tract_params[i].neutral;
    for (int i = 0; i < kGlottisParams; ++i)
      t[kTractParams + i] = s.glottis_params[i].neutral;
    return t;
  };
  auto add = [&](const char* name, bool voiced, double tau,
                 std::initializer_list<std::pair<int, double>> mods) {
    Speaker::Phone ph;
    ph.name = name;
    ph.voiced = voiced;
    ph.time_constant_s = tau;
    ph.target = base();
    if (!voiced) {
      ph.target[21] = 0.10;   // XB abducted
      ph.target[22] = 0.25;   // XT abducted
      ph.target[23] = 0.05;   // CA
      ph.target[29] = -12.0;  // AS aspiration on
    }
    for (auto& m : mods) ph.target[m.first] = m.second;
    s.phones.push_back(ph);
    return s.phones.size() - 1;
  };

  // vowels                      JA        TCX      TCY     LD       LP
  add("a", true, 0.018, {{3, -5.0}, {8, 1.0}, {9, -2.2}, {5, 1.4}});
  add("e", true, 0.018, {{3, -3.0}, {8, 1.5}, {9, -0.3}, {5, 1.0}});
  add("i", true, 0.018, {{3, -1.5}, {8, 2.2}, {9, 0.5}, {5, 0.8}});
  add("o", true, 0.018, {{3, -3.5}, {8, -1.2}, {9, -0.6}, {5, 0.8}, {4, 0.5}});
  add("u", true, 0.018, {{3, -1.8}, {8, -1.6}, {9, 0.2}, {5, 0.4}, {4, 0.8}});
  add("@", true, 0.018, {});
  // plosives: lips / tip / body closures
  add("p", false, 0.010, {{5, -0.8}});
  add("b", true, 0.010, {{5, -0.8}});
  add("t", false, 0.010, {{11, 2.2}});
  add("d", true, 0.010, {{11, 2.2}});
  add("k", false, 0.010, {{8, -0.5}, {9, 0.95}});
  add("g", true, 0.010, {{8, -0.5}, {9, 0.95}});
  // nasals: closure + open velum
  add("m", true, 0.012, {{5, -0.8}, {7, 0.8}});
  add("n", true, 0.012, {{11, 2.2}, {7, 0.8}});
  add("N", true, 0.012, {{8, -0.5}, {9, 0.95}, {7, 0.8}});
  // fricatives: narrow constrictions
  add("f", false, 0.012, {{5, 0.08}});
  add("v", true, 0.012, {{5, 0.08}});
  add("s", false, 0.012, {{11, 1.3}});
  add("z", true, 0.012, {{11, 1.3}});
  add("S", false, 0.012, {{13, 3.6}, {11, 1.0}});
  // approximants
  add("l", true, 0.014, {{11, 2.2}, {18, -0.8}});
  add("r", true, 0.014, {{11, 0.9}, {14, -2.0}});
  add("j", true, 0.014, {{8, 2.0}, {9, 0.3}});
  add("w", true, 0.014, {{8, -1.4}, {9, 0.1}, {5, 0.3}, {4, 0.8}});
  add("h", false, 0.012, {});
  // silence: no pressure
  add("_", true, 0.012, {{20, 0.0}});
  return s;
}

const Speaker::Phone* Speaker::find_phone(const std::string& name) const {
  for (auto& p : phones)
    if (p.name == name) return &p;
  return nullptr;
}

void Speaker::clamp_tract(double* p) const {
  for (int i = 0; i < kTractParams && i < (int)tract_params.size(); ++i)
    p[i] = clampd(p[i], tract_params[i].min, tract_params[i].max);
}

Speaker Speaker::load(const std::string& path, std::string* err) {
  // speaker files are an INI-like override of the builtin anatomy; the
  // builtin is used directly for "" or "default"
  Speaker s = builtin_default();
  if (path.empty() || path == "default") return s;
  std::ifstream fh(path);
  if (!fh) {
    if (err) *err = "cannot open speaker file: " + path;
    s.name = "<error>";
    return s;
  }
  std::string line, section;
  while (std::getline(fh, line)) {
    // strip comments / whitespace
    auto hash = line.find('#');
    if (hash != std::string::npos) line = line.substr(0, hash);
    std::istringstream ls(line);
    std::string tok;
    if (!(ls >> tok)) continue;
    if (tok.size() > 1 && tok.front() == '[') {
      section = tok.substr(1, tok.size() - 2);
      continue;
    }
    if (section == "meta" && tok == "name") {
      std::string eq;
      ls >> eq >> s.name;
    } else if (section == "anatomy") {
      std::string eq;
      double v;
      ls >> eq >> v;
      if (tok == "base_length_cm") s.base_length_cm = v;
      if (tok == "fold_length_cm") s.fold_length_cm = v;
      if (tok == "nasal_length_cm") s.nasal_length_cm = v;
    } else if (section == "tract_map") {
      std::string eq;
      double v;
      ls >> eq >> v;
      auto& m = s.tract_map;
      if (tok == "gain_body") m.gain_body = v;
      if (tok == "exp_body") m.exp_body = v;
      if (tok == "gain_blade") m.gain_blade = v;
      if (tok == "exp_blade") m.exp_blade = v;
      if (tok == "gain_tip") m.gain_tip = v;
      if (tok == "exp_tip") m.exp_tip = v;
      if (tok == "gain_root") m.gain_root = v;
      if (tok == "exp_root") m.exp_root = v;
      if (tok == "lip_factor") m.lip_factor = v;
    } else if (section == "source") {
      std::string eq;
      double v;
      ls >> eq >> v;
      auto& sc = s.source;
      if (tok == "deriv_mix") sc.deriv_mix = v;
      if (tok == "skew_offset") sc.skew_offset = v;
      if (tok == "aspiration_db") sc.aspiration_db = v;
    } else if (section == "tract_affine") {
      // "area <i> <coef...>" / "length <coef...>" / "incisor <coef...>"
      // / "tongue_tip <coef...>" / "velum <coef...>"
      auto& ta = s.tract_affine;
      auto read_coefs = [&ls]() {
        std::vector<double> c;
        double v;
        while (ls >> v) c.push_back(v);
        return c;
      };
      if (tok == "area") {
        // a malformed row (bad index, empty, or a coefficient count that
        // mismatches the first row's) must FAIL the load: silently
        // skipping it would leave that section's coefficients all zero
        // (log-area 0 -> area 1 cm^2) while present() stays true —
        // quietly wrong tube areas from a truncated speaker file
        int idx = -1;
        std::vector<double> c;
        bool ok = static_cast<bool>(ls >> idx);
        if (ok) c = read_coefs();
        ok = ok && idx >= 0 && idx < kTubeSections && !c.empty();
        if (ok && ta.n_coef == 0) {
          ta.n_coef = (int)c.size();
          ta.area.assign(kTubeSections * ta.n_coef, 0.0);
        }
        ok = ok && (int)c.size() == ta.n_coef;
        if (!ok) {
          if (err)
            *err = "malformed [tract_affine] area row (index " +
                   std::to_string(idx) + ") in " + path;
          s.name = "<error>";
          return s;
        }
        std::copy(c.begin(), c.end(), ta.area.begin() + idx * ta.n_coef);
      } else if (tok == "length") {
        ta.length = read_coefs();
      } else if (tok == "incisor") {
        ta.incisor = read_coefs();
      } else if (tok == "tongue_tip") {
        ta.tongue_tip = read_coefs();
      } else if (tok == "velum") {
        ta.velum = read_coefs();
      }
    } else if (section == "tract_params" || section == "glottis_params") {
      // "<index> <name> <min> <max> <neutral>"
      int idx = std::stoi(tok);
      std::string nm;
      double mn, mx, ne;
      if (ls >> nm >> mn >> mx >> ne) {
        auto& tab = (section == "tract_params") ? s.tract_params : s.glottis_params;
        if (idx >= 0 && idx < (int)tab.size()) {
          tab[idx].name = nm;
          tab[idx].min = mn;
          tab[idx].max = mx;
          tab[idx].neutral = ne;
        }
      }
    } else if (section == "phones") {
      // "<name> <voiced 0|1> <tau_s> <30 target values>"
      Speaker::Phone ph;
      ph.name = tok;
      int voiced;
      ls >> voiced >> ph.time_constant_s;
      ph.voiced = voiced != 0;
      bool ok = true;
      for (int i = 0; i < 30; ++i)
        if (!(ls >> ph.target[i])) {
          ok = false;
          break;
        }
      if (ok) {
        // replace or append
        bool replaced = false;
        for (auto& existing : s.phones)
          if (existing.name == ph.name) {
            existing = ph;
            replaced = true;
          }
        if (!replaced) s.phones.push_back(ph);
      }
    }
  }
  return s;
}

// ---------------------------------------------------------------------------
// tract model: 19 parameters -> sagittal distance profile -> tube
// ---------------------------------------------------------------------------

namespace {

// rest sagittal distance d(x) and effective width w(x) along the normalized
// tract axis (0 = glottis, 1 = lips)
constexpr int kNP = 11;
constexpr double kPX[kNP] = {0.00, 0.06, 0.12, 0.25, 0.40, 0.50,
                             0.62, 0.75, 0.85, 0.92, 1.00};
constexpr double kPD[kNP] = {0.40, 0.90, 1.30, 1.50, 1.40, 1.30,
                             1.20, 1.10, 0.90, 0.80, 0.70};
constexpr int kNW = 6;
constexpr double kWX[kNW] = {0.00, 0.12, 0.45, 0.75, 0.92, 1.00};
constexpr double kWW[kNW] = {1.20, 2.00, 3.20, 2.80, 2.00, 1.40};

struct TractGeometry {
  double length_cm;
  // evaluated distance/width at a position
  double d(double x) const;
  double w(double x) const { return profile(kWX, kWW, kNW, x); }
  // articulation state derived from params
  double jaw_open, lip_dist, velum_open, vs;
  double c_body, p_body, c_blade, p_blade, c_tip, p_tip, c_root, p_root;
  double try_narrow;
  double ts1, ts2, ts3;
  double lip_factor;
  // constriction amplitudes (hoisted out of the per-section loop: they
  // depend only on the proximity values, not on x)
  double a_body, a_blade, a_tip, a_root;
};

TractGeometry make_geometry(const Speaker& spk, const double* q) {
  TractGeometry g;
  const double HX = q[0], HY = q[1], JX = q[2], JA = q[3], LP = q[4],
               LD = q[5], VS = q[6], VO = q[7], TCX = q[8], TCY = q[9],
               TTX = q[10], TTY = q[11], TBX = q[12], TBY = q[13],
               TRX = q[14], TRY = q[15], TS1 = q[16], TS2 = q[17],
               TS3 = q[18];

  g.length_cm = spk.base_length_cm + 0.5 * HX - 0.6 * (HY + 4.75) +
                0.8 * std::max(LP, 0.0) + 0.2 * std::min(LP, 0.0);
  g.jaw_open = (-JA) / 7.0;             // 0 closed .. 1 open
  g.lip_dist = LD;
  g.velum_open = std::max(VO, 0.0);
  g.vs = VS;

  g.c_body = 0.60 + 0.030 * TCX + 0.008 * JX;
  g.p_body = clampd((TCY + 3.0) / 4.0, 0.0, 1.1);
  g.c_blade = 0.72 + 0.020 * TBX + 0.008 * JX;
  g.p_blade = clampd((TBY + 3.0) / 8.0, 0.0, 1.1);
  g.c_tip = 0.82 + 0.018 * TTX + 0.010 * JX;
  g.p_tip = clampd((TTY + 3.0) / 5.5, 0.0, 1.1);
  g.c_root = 0.30;
  g.p_root = clampd((2.0 - TRX) / 6.0, 0.0, 1.1);
  g.try_narrow = std::max(0.0, -(TRY + 3.0) / 3.0);
  g.ts1 = clampd(TS1, 0.0, 1.0);
  g.ts2 = clampd(TS2, 0.0, 1.0);
  g.ts3 = clampd(TS3, -1.0, 1.0);
  // proximity -> closing amplitude, per articulator; integer exponents go
  // through plain multiplies so the default map is bit-identical to the
  // pre-[tract_map] geometry
  auto amp = [](double gain, double e, double p) {
    if (e == 3.0) return gain * p * p * p;
    if (e == 2.0) return gain * p * p;
    if (e == 1.0) return gain * p;
    return p <= 0.0 ? 0.0 : gain * std::pow(p, e);
  };
  const Speaker::TractMap& m = spk.tract_map;
  g.a_body = amp(m.gain_body, m.exp_body, g.p_body);
  g.a_blade = amp(m.gain_blade, m.exp_blade, g.p_blade);
  g.a_tip = amp(m.gain_tip, m.exp_tip, g.p_tip);
  g.a_root = amp(m.gain_root, m.exp_root, g.p_root) + 0.25 * g.try_narrow;
  g.lip_factor = m.lip_factor;
  return g;
}

double TractGeometry::d(double x) const {
  double dist = profile(kPX, kPD, kNP, x);
  // tongue constrictions (Gaussian approach of articulator to outer wall);
  // the proximity nonlinearity keeps vowel articulations open while extreme
  // positions (stops) still reach full closure.  The tongue is one surface:
  // its members combine by max, not by sum.
  double body = a_body * gauss(x, c_body, 0.12);
  double blade = a_blade * gauss(x, c_blade, 0.08);
  double tip = a_tip * gauss(x, c_tip, 0.05);
  double root = a_root * gauss(x, c_root, 0.10);
  dist -= std::max(std::max(body, blade), std::max(tip, root));
  // velum lowering narrows the velar passage slightly
  dist -= 0.30 * vs * gauss(x, 0.50, 0.05);
  // jaw opening adds distance in the oral region
  double taper = clampd((x - 0.55) / 0.35, 0.0, 1.0);
  dist += 0.9 * (jaw_open - 2.0 / 7.0) * taper;
  // lips: blend toward the lip-distance aperture near the mouth opening
  // (the LD parameter is itself a sagittal distance in cm)
  double ls = clampd((x - 0.90) / 0.07, 0.0, 1.0);
  dist = lerp(dist, lip_factor * lip_dist, ls);
  return dist;
}

// Everything in TractGeometry::d / w that depends only on the section
// position x — the piecewise-linear rest profiles (branchy anchor scans),
// the fixed-center gaussians (velum, tongue-side zones), the jaw taper and
// lip-blend weights, and the articulator labels — is precomputed ONCE at
// the 40 fixed section midpoints with the exact same expressions, so the
// per-call tract_to_tube loop is branch-free over constant tables and
// auto-vectorizes.  Values are bit-identical to the formerly-inline
// evaluation by construction.
struct TractTables {
  alignas(64) double x[kTubeSections];
  alignas(64) double base_d[kTubeSections];   // rest sagittal profile
  alignas(64) double w[kTubeSections];        // effective width profile
  alignas(64) double g_velum[kTubeSections];  // gauss(x, 0.50, 0.05)
  alignas(64) double taper[kTubeSections];    // jaw-opening taper weight
  alignas(64) double ls[kTubeSections];       // lip-blend weight
  alignas(64) double g_ts1[kTubeSections];    // gauss(x, 0.58, 0.10)
  alignas(64) double g_ts2[kTubeSections];    // gauss(x, 0.72, 0.08)
  alignas(64) double g_ts3[kTubeSections];    // gauss(x, 0.83, 0.06)
  int articulator[kTubeSections];
  TractTables() {
    for (int i = 0; i < kTubeSections; ++i) {
      double xi = (i + 0.5) / kTubeSections;
      x[i] = xi;
      base_d[i] = profile(kPX, kPD, kNP, xi);
      w[i] = profile(kWX, kWW, kNW, xi);
      g_velum[i] = gauss(xi, 0.50, 0.05);
      taper[i] = clampd((xi - 0.55) / 0.35, 0.0, 1.0);
      ls[i] = clampd((xi - 0.90) / 0.07, 0.0, 1.0);
      g_ts1[i] = gauss(xi, 0.58, 0.10);
      g_ts2[i] = gauss(xi, 0.72, 0.08);
      g_ts3[i] = gauss(xi, 0.83, 0.06);
      articulator[i] = xi < 0.03   ? kVocalFolds
                       : xi < 0.32 ? kOtherArticulator
                       : xi < 0.86 ? kTongue
                       : xi < 0.93 ? kLowerIncisors
                                   : kLowerLip;
    }
  }
};

const TractTables& tract_tables() {
  static const TractTables t;
  return t;
}

}  // namespace

namespace {

// evaluate one [tract_affine] row: b + sum w_j q_j (+ sum v_j q_j^2)
double affine_eval(const double* c, int n_coef, const double* q) {
  double s = c[0];
  for (int j = 0; j < kTractParams; ++j) s += c[1 + j] * q[j];
  if (n_coef >= 1 + 2 * kTractParams)
    for (int j = 0; j < kTractParams; ++j)
      s += c[1 + kTractParams + j] * q[j] * q[j];
  return s;
}

// fitted tube map: per-section log-areas (and optionally total length /
// extraction scalars) from the speaker's [tract_affine] coefficients,
// fitted against an external tract model (speaker_import.fit_tract_affine)
void tract_to_tube_affine(const Speaker& spk, const double* q, Tube* tube) {
  const auto& ta = spk.tract_affine;
  const TractTables& tt = tract_tables();
  TractGeometry g = make_geometry(spk, q);  // geometric fallback scalars

  double length = g.length_cm;
  if ((int)ta.length.size() == ta.n_coef)
    length = clampd(affine_eval(ta.length.data(), ta.n_coef, q), 4.0, 30.0);
  const double sec_len = length / kTubeSections;
  for (int i = 0; i < kTubeSections; ++i) {
    double log_area = affine_eval(ta.area.data() + i * ta.n_coef,
                                  ta.n_coef, q);
    log_area = clampd(log_area, -9.0, 2.71);  // area in [~1.2e-4, 15]
    tube->length_cm[i] = sec_len;
    tube->area_cm2[i] = fast_exp(log_area);
    tube->articulator[i] = tt.articulator[i];
  }
  tube->total_length_cm = length;
  tube->incisor_pos_cm =
      (int)ta.incisor.size() == ta.n_coef
          ? clampd(affine_eval(ta.incisor.data(), ta.n_coef, q), 10.0, 22.0)
          : clampd(length * 0.90 + 0.8 + 0.4 * q[2], 14.0, 18.0);
  tube->tongue_tip_side_elevation =
      (int)ta.tongue_tip.size() == ta.n_coef
          ? affine_eval(ta.tongue_tip.data(), ta.n_coef, q)
          : g.ts3;
  tube->velum_opening_cm2 =
      (int)ta.velum.size() == ta.n_coef
          ? clampd(affine_eval(ta.velum.data(), ta.n_coef, q), 0.0, 1.0)
          : clampd(g.velum_open, 0.0, 1.0);
}

}  // namespace

void tract_to_tube(const Speaker& spk, const double* tract, Tube* tube) {
  std::array<double, kTractParams> q;
  std::memcpy(q.data(), tract, sizeof(q));
  spk.clamp_tract(q.data());
  if (spk.tract_affine.present()) {
    tract_to_tube_affine(spk, q.data(), tube);
    return;
  }
  TractGeometry g = make_geometry(spk, q.data());
  const TractTables& tt = tract_tables();

  // hoist the loop-invariant scalars (same arithmetic as the inline path)
  const double sec_len = g.length_cm / kTubeSections;
  const double jaw_term = 0.9 * (g.jaw_open - 2.0 / 7.0);
  const double lip_target = g.lip_factor * g.lip_dist;
  const double vs30 = 0.30 * g.vs;
  const double ts1f = 0.45 * g.ts1, ts2f = 0.45 * g.ts2;
  const bool ts3_up = g.ts3 > 0;
  const double ts3f = ts3_up ? 0.45 * g.ts3 : 0.35 * (-g.ts3);

  for (int i = 0; i < kTubeSections; ++i) {
    const double x = tt.x[i];
    // tongue constrictions (gaussians with per-call centers); for the
    // builtin parameter ranges the exponents stay far above fast_exp2's
    // underflow edge, so the branch-free gaussians are bit-identical to
    // the clamped path and the loop if-converts + vectorizes; the helper's
    // exponent floor keeps user speaker files with wide ranges safe
    double body = g.a_body * fast_gauss_nc(x, g.c_body, 0.12);
    double blade = g.a_blade * fast_gauss_nc(x, g.c_blade, 0.08);
    double tip = g.a_tip * fast_gauss_nc(x, g.c_tip, 0.05);
    double root = g.a_root * fast_gauss_nc(x, g.c_root, 0.10);
    double dist = tt.base_d[i] -
                  std::max(std::max(body, blade), std::max(tip, root));
    dist -= vs30 * tt.g_velum[i];
    dist += jaw_term * tt.taper[i];
    dist = lerp(dist, lip_target, tt.ls[i]);
    dist = std::max(dist, 0.0);
    // dist^1.3 (fast_pow if-converted: the threshold keeps the exponent in
    // fast_exp2_nc's exact range; below it the old path returned < 2^-863).
    // The exponent is also clamped above at 1020 — absurd user speaker
    // ranges (dist >= ~2^787) would otherwise wrap the bit-cast into NaN,
    // and NaN survives clampd; semantics-free since area caps at 15 anyway.
    double e13 = 1.3 * fast_log2_bc(dist);
    e13 = e13 > 1020.0 ? 1020.0 : e13;
    double p13 = (dist > 1e-200) ? fast_exp2_nc(e13) : 0.0;
    double area = tt.w[i] * p13;
    // tongue side elevation reduces lateral area in its zone; a negative
    // TS3 (lowered sides) keeps a lateral bypass open at the tip
    area *= 1.0 - ts1f * tt.g_ts1[i];
    area *= 1.0 - ts2f * tt.g_ts2[i];
    if (ts3_up)
      area *= 1.0 - ts3f * tt.g_ts3[i];
    else
      area += ts3f * tt.g_ts3[i];
    tube->length_cm[i] = sec_len;
    tube->area_cm2[i] = clampd(area, 0.0, 15.0);
    tube->articulator[i] = tt.articulator[i];
  }
  tube->total_length_cm = g.length_cm;
  tube->incisor_pos_cm = clampd(g.length_cm * 0.90 + 0.8 + 0.4 * q[2], 14.0, 18.0);
  tube->tongue_tip_side_elevation = g.ts3;
  tube->velum_opening_cm2 = clampd(g.velum_open, 0.0, 1.0);
}

void tract_to_outline(const Speaker& spk, const double* tract, Outline* out) {
  std::array<double, kTractParams> q;
  std::memcpy(q.data(), tract, sizeof(q));
  spk.clamp_tract(q.data());
  TractGeometry g = make_geometry(spk, q.data());

  // midline: quarter-circle bend from vertical (pharynx) to horizontal
  // (oral cavity); arc length = tract length
  const int n = 64;
  out->mid_x.resize(n);
  out->mid_y.resize(n);
  out->out_x.resize(n);
  out->out_y.resize(n);
  out->in_x.resize(n);
  out->in_y.resize(n);
  const double L = g.length_cm;
  const double bend_r = 3.0;  // cm, radius of the pharynx->oral bend
  const double straight = (L - M_PI / 2.0 * bend_r) / 2.0;
  for (int i = 0; i < n; ++i) {
    double s = L * i / (n - 1);
    double x, y, nx, ny;  // position + outward normal
    if (s < straight) {  // vertical pharynx segment going up
      x = 0.0;
      y = s;
      nx = -1.0;
      ny = 0.0;
    } else if (s < straight + M_PI / 2.0 * bend_r) {  // bend
      double a = (s - straight) / bend_r;  // 0..pi/2
      x = bend_r - bend_r * std::cos(a);
      y = straight + bend_r * std::sin(a);
      nx = -std::cos(a);
      ny = std::sin(a);
    } else {  // horizontal oral segment going forward
      x = bend_r + (s - straight - M_PI / 2.0 * bend_r);
      y = straight + bend_r;
      nx = 0.0;
      ny = 1.0;
    }
    double xr = (double)i / (n - 1);
    double dd = std::max(g.d(xr), 0.0);
    out->mid_x[i] = x;
    out->mid_y[i] = y;
    out->out_x[i] = x + nx * dd / 2.0;
    out->out_y[i] = y + ny * dd / 2.0;
    out->in_x[i] = x - nx * dd / 2.0;
    out->in_y[i] = y - ny * dd / 2.0;
  }
  // virtual tongue sensors: inner wall at the back/mid/tip tongue zones
  const double zones[3] = {0.55, 0.70, 0.84};
  for (int k = 0; k < 3; ++k) {
    int i = (int)std::round(zones[k] * (n - 1));
    out->tongue_sensors[k] = {out->in_x[i], out->in_y[i], 0.0};
  }
}

// ---------------------------------------------------------------------------
// glottis
// ---------------------------------------------------------------------------

void GlottisState::reset() {
  phase = 0.0;
  pulse_index = 0;
  noise_state = 0x9e3779b9u;
  asp_lp = 0.0;
  u_prev_ = 0.0;
}

void GlottisState::prepare(const Speaker& spk, const double* gp) {
  const double F0 = clampd(gp[0], 0.0, 600.0);
  const double PR = std::max(gp[1], 0.0);
  const double XB = gp[2], XT = gp[3];
  const double CA = gp[4], LAG = gp[5], RA = gp[6], DP = gp[7], PS = gp[8],
               FL = gp[9], AS = gp[10];

  // flutter: slow quasi-random f0 modulation (Klatt-style three-sine);
  // 4.7-12.7 Hz, so sampling it once per control block is exact enough.
  // fast_sin2pi replaces libm sin (this runs per control block): abs error
  // <3e-10 on a modulation whose own scale is <=2% of F0 — inaudible.
  double t = (double)pulse_index / std::max(F0, 1.0) +
             phase / std::max(F0, 1.0);
  double flut = (FL / 50.0) * 0.01 *
                (fast_sin2pi(12.7 * t) + fast_sin2pi(7.1 * t) +
                 fast_sin2pi(4.7 * t)) / 3.0;
  f0_eff_ = F0 * (1.0 + flut);

  // PS (pulse skewness) modulates the oscillation asymmetry exponent;
  // the per-speaker source calibration can sharpen/soften closure on top
  // ([source] skew_offset — clamped so the pow-chain approximations stay
  // in their validated domain)
  skew_ = 1.6 + PS;
  if (spk.source.skew_offset != 0.0)
    skew_ = clampd(skew_ + spk.source.skew_offset, 0.2, 6.0);
  lag_phase_ = LAG / (2.0 * M_PI);
  dp_ = DP;
  amp_ = 0.16 * (0.3 + 0.7 * (RA + 1.0) / 2.0) * std::sqrt(PR / 8000.0);
  xb_ = XB;
  xt_ = XT;
  chink_ = std::max(0.0, CA);
  fold2_ = 2.0 * spk.fold_length_cm;
  // Bernoulli flow coefficient (cgs): u = A * sqrt(2 dP / rho)
  u_coeff_ = std::sqrt(2.0 * PR * 10.0 / 1.14e-3);
  // 10^(AS/20) as 2^(AS * log2(10)/20): rel err <3e-9 on an aspiration
  // gain — far below audibility, and ~10x faster than libm pow
  asp_gain13_ = fast_exp2(AS * 0.16609640474436813) * 1.3;
  if (spk.source.aspiration_db != 0.0)
    asp_gain13_ *= fast_exp2(spk.source.aspiration_db * 0.16609640474436813);
  deriv_k_ = spk.source.deriv_mix * kSourceDerivNorm;
}

double GlottisState::step(double* area_out) {
  phase += f0_eff_ / kInternalSampleRate;
  if (phase >= 1.0) {
    phase -= 1.0;
    pulse_index++;
  }

  // asymmetric glottal oscillation in [0, 1]: slow opening, fast closure
  // (the abrupt closing phase is what gives voiced speech its harmonic
  // richness)
  const double skew = skew_;
  auto osc_fn = [skew](double p) {
    p -= std::floor(p);
    // p^skew then sin^2(pi*) via polynomial approximations (fastmath.h);
    // p -> 0 still limits to 0 (log2 -> -inf, exp2 underflows to 0)
    double ps = (p > 0.0) ? fast_pow(p, skew) : 0.0;
    return fast_sinpi_sq(ps > 1.0 ? 1.0 : ps);
  };
  double osc_b = osc_fn(phase);
  double osc_t = osc_fn(phase - lag_phase_);

  double amp_mod = 1.0 - 0.5 * dp_ * (double)(pulse_index & 1u);
  double a = amp_ * amp_mod;

  // fold edge displacements oscillate around the rest displacement; the
  // "- 0.3 a" offset produces a closed phase for adducted folds
  double x_b = xb_ + a * (osc_b - 0.3);
  double x_t = xt_ + a * (osc_t - 0.3);
  double a_fold = fold2_ * std::max(0.0, std::min(x_b, x_t));
  double a_g = a_fold + chink_;
  if (area_out) *area_out = a_g;

  double u = a_g * u_coeff_;

  // aspiration noise, lowpassed, gated by opening and pressure;
  // sqrt(x)*sqrt(y) fused to sqrt(x*y) (both factors are non-negative)
  double n = white(&noise_state);
  asp_lp += 0.25 * (n - asp_lp);
  double asp = asp_lp * asp_gain13_ *
               std::sqrt(std::max(u, 0.0) * (a_g + 0.01));

  // per-speaker source calibration: derivative mix tilts the source
  // spectrum up (deriv_k_ == 0 -> y == raw bit-exactly)
  double raw = u + asp * 40.0;
  double y = raw + deriv_k_ * (raw - u_prev_);
  u_prev_ = raw;
  return y;
}

void GlottisState::step_block(int n, double* out) {
  if (n != kControlBlock) {
    // partial tail block: the scalar path (identical math)
    for (int i = 0; i < n; ++i) out[i] = step(nullptr);
    return;
  }
  constexpr int B = kControlBlock;

  // scalar prologue: phase accumulator, pulse parity, noise sequence (all
  // cheap recurrences that can't vectorize)
  alignas(64) double ph[B], par[B], nz[B];
  for (int i = 0; i < B; ++i) {
    phase += f0_eff_ / kInternalSampleRate;
    if (phase >= 1.0) {
      phase -= 1.0;
      pulse_index++;
    }
    ph[i] = phase;
    par[i] = (double)(pulse_index & 1u);
    nz[i] = white(&noise_state);
  }

  // SIMD loop (fixed trip count = one AVX-512 iteration): the oscillator
  // chain, branch-free.  osc(p) = sin^2(pi * min(p^skew, 1)) with p
  // floored at 5e-4 — p^skew is then >= ~8e-9 (skew <= ~2.6),
  // osc < 1e-15: acoustically identical to the scalar path's exact 0 at
  // p = 0, but exp2 never reaches its underflow branch so the whole chain
  // if-converts.
  const double skew = skew_, lag = lag_phase_;
  alignas(64) double uu[B], gg[B];
  for (int i = 0; i < B; ++i) {
    double pb = ph[i];
    double pt = pb - lag;
    pt -= std::floor(pt);
    pb = std::max(pb, 5e-4);
    pt = std::max(pt, 5e-4);
    // exponent clamped to [-1000, 0] so extreme skew values of EITHER
    // sign — reachable through user speaker files widening the PS range
    // (negative skew times log2(p) in [-11,0) is large POSITIVE) — stay
    // inside fast_exp2_nc's valid domain.  The upper clamp at 0 is exact:
    // eb/et are immediately min'd with 1.0 and 2^0 = 1.  If-converts, the
    // loop still vectorizes.
    double tb = skew * fast_log2_bc(pb);
    double tt2 = skew * fast_log2_bc(pt);
    tb = tb < -1000.0 ? -1000.0 : (tb > 0.0 ? 0.0 : tb);
    tt2 = tt2 < -1000.0 ? -1000.0 : (tt2 > 0.0 ? 0.0 : tt2);
    double eb = fast_exp2_nc(tb);
    double et = fast_exp2_nc(tt2);
    double osc_b = fast_sinpi_sq(std::min(eb, 1.0));
    double osc_t = fast_sinpi_sq(std::min(et, 1.0));
    double a = amp_ * (1.0 - 0.5 * dp_ * par[i]);
    double x_b = xb_ + a * (osc_b - 0.3);
    double x_t = xt_ + a * (osc_t - 0.3);
    double a_fold = fold2_ * std::max(0.0, std::min(x_b, x_t));
    double a_g = a_fold + chink_;
    double u = a_g * u_coeff_;
    uu[i] = u;
    gg[i] = std::sqrt(std::max(u, 0.0) * (a_g + 0.01));
  }

  // scalar epilogue: the aspiration lowpass and the source-calibration
  // derivative mix are genuine recurrences (deriv_k_ == 0 -> out == raw
  // bit-exactly, matching the uncalibrated path)
  double up = u_prev_;
  for (int i = 0; i < B; ++i) {
    asp_lp += 0.25 * (nz[i] - asp_lp);
    double raw = uu[i] + asp_lp * asp_gain13_ * gg[i] * 40.0;
    out[i] = raw + deriv_k_ * (raw - up);
    up = raw;
  }
  u_prev_ = up;
}

// ---------------------------------------------------------------------------
// waveguide
// ---------------------------------------------------------------------------

void Waveguide::reset() {
  for (int s = 0; s < 2; ++s) {
    fbuf_[s].fill(0.0);
    bbuf_[s].fill(0.0);
    nfbuf_[s].fill(0.0);
    nbbuf_[s].fill(0.0);
  }
  cur_ = 0;
  lip_lp_ = lip_out_prev_ = radiated_prev_ = nose_lp_ = fric_lp_ = 0.0;
  nasal_cooldown_ = 0;
}

namespace {

constexpr double kAreaFloor = 1e-4;
constexpr double kFlowScale = 4.0e-4;  // flow (cm^3/s) -> wave amplitude
constexpr double kC = 35000.0;         // speed of sound, cm/s

// Each lattice section delays one sample, i.e. spans c/fs cm of tract.
// Quantizing the geometric tube length to an effective section count
// makes the length parameters (and speaker anatomy) acoustically real:
// a shorter tract uses fewer sections and all formants rise.
int quantize_sections(double total_cm) {
  constexpr double cm_per_section = kC / kInternalSampleRate;
  int M = (int)std::lround(total_cm / cm_per_section);
  if (M < 8) M = 8;
  if (M > kTubeSections) M = kTubeSections;
  return M;
}

// resample the 40 geometric sections onto the M acoustic sections (no
// area floor here — callers apply it after any temporal interpolation)
void resample_areas(const double* area40, int M, double* out) {
  constexpr int kM = kTubeSections;
  for (int j = 0; j < M; ++j) {
    double pos = (j + 0.5) / M * kM - 0.5;
    int i0 = (int)std::floor(pos);
    double t = pos - i0;
    int ia = std::max(0, std::min(kM - 1, i0));
    int ib = std::max(0, std::min(kM - 1, i0 + 1));
    out[j] = (1.0 - t) * area40[ia] + t * area40[ib];
  }
}

}  // namespace

// derive all per-block coefficients from A_[0..M) + the nasal port
void Waveguide::commit_(int M, double a_port) {
  if (M < M_) {
    // effective tract shortened: clear the dropped sections' state (both
    // ping-pong buffers) so it cannot resurface if M grows again later
    for (int i = M; i < M_; ++i)
      fbuf_[0][i] = fbuf_[1][i] = bbuf_[0][i] = bbuf_[1][i] = 0.0;
  }
  M_ = M;

  // interior scattering coefficients (the per-junction divide lives here,
  // at control rate, not in the per-sample loop)
  for (int i = 0; i < M - 1; ++i)
    k_[i] = (A_[i] - A_[i + 1]) / (A_[i] + A_[i + 1]);

  src_scale_ = kFlowScale / std::sqrt(A_[0]);
  // lip end: area-dependent radiation reflection (a wider mouth opening
  // reflects less and radiates more)
  lip_refl_ = -(0.95 - 0.10 * std::sqrt(A_[M - 1]));

  a_port_ = a_port;
  iv_ = (int)(0.48 * M);  // velar junction index
  // three-port junction scale (division hoisted out of the sample loop)
  port_scale_ = 2.0 / (A_[iv_] + A_[iv_ + 1] + a_port_);

  // nasal branch geometry: smooth fixed profile (constant coefficients)
  if (!nasal_k_ready_) {
    constexpr int NN = kNasalSections;
    static const double nasal_area[NN] = {1.5, 2.2, 3.0, 3.6, 4.0, 4.0, 3.6,
                                          3.0, 2.4, 2.0, 1.6, 1.3, 1.1, 1.0};
    for (int i = 0; i < NN - 1; ++i)
      nk_[i] = (nasal_area[i] - nasal_area[i + 1]) /
               (nasal_area[i] + nasal_area[i + 1]);
    nasal_k_ready_ = true;
  }

  // frication site: the narrowest supraglottal constriction
  int im = M / 4;
  double amin = 1e9;
  for (int i = M / 4; i < M; ++i)
    if (A_[i] < amin) {
      amin = A_[i];
      im = i;
    }
  fric_i_ = im;
  fric_amp_ = (amin < 0.4) ? (0.4 - amin) / 0.4 : 0.0;
}

void Waveguide::set_tube(const Tube& tube) {
  double total_cm = 0.0;
  for (int i = 0; i < kTubeSections; ++i) total_cm += tube.length_cm[i];
  int M = quantize_sections(total_cm);
  resample_areas(tube.area_cm2.data(), M, A_);
  for (int j = 0; j < M; ++j) A_[j] = std::max(A_[j], kAreaFloor);
  commit_(M, tube.velum_opening_cm2);
}

void Waveguide::set_ramp(const Tube& t0, const Tube& t1) {
  total0_ = total1_ = 0.0;
  for (int i = 0; i < kTubeSections; ++i) {
    e0_area_[i] = t0.area_cm2[i];
    e1_area_[i] = t1.area_cm2[i];
    total0_ += t0.length_cm[i];
    total1_ += t1.length_cm[i];
  }
  velum0_ = t0.velum_opening_cm2;
  velum1_ = t1.velum_opening_cm2;
  ramp_M_ = -1;
}

void Waveguide::blend(double a) {
  int M = quantize_sections(lerp(total0_, total1_, a));
  if (M != ramp_M_) {
    // the quantized grid moved (at most once or twice along a ramp):
    // re-resample both endpoints onto it
    resample_areas(e0_area_, M, rA0_);
    resample_areas(e1_area_, M, rA1_);
    ramp_M_ = M;
  }
  for (int j = 0; j < M; ++j)
    A_[j] = std::max(lerp(rA0_[j], rA1_[j], a), kAreaFloor);
  commit_(M, lerp(velum0_, velum1_, a));
}

double Waveguide::step(double glottal_flow) {
  double out;
  step_block(1, &glottal_flow, &out);
  return out;
}

void Waveguide::step_block(int n, const double* flows, double* out) {
  constexpr double kDamp = 0.996;
  constexpr double kGlottisRefl = 0.96;
  const int M = M_;
  const bool nasal_on = a_port_ > 1e-4;

  // block-invariant coefficients and scalar filter states hoisted into
  // locals: per-sample step() paid member load/store traffic for all of
  // these on every sample; here they stay in registers across the block
  // and are written back once.
  const double src_scale = src_scale_;
  const double lip_refl = lip_refl_;
  const double* __restrict k = k_;
  const int iv = iv_;
  const double y1 = A_[iv], y2 = A_[iv + 1], y3 = a_port_;
  const double port_scale = port_scale_;
  const int fric_i = fric_i_;
  const double fric_amp = fric_amp_;
  double lip_lp = lip_lp_;
  double lip_out_prev = lip_out_prev_;
  double radiated_prev = radiated_prev_;
  double nose_lp = nose_lp_;
  double fric_lp = fric_lp_;
  uint32_t nstate = noise_state_;
  int cur = cur_;
  int cooldown = nasal_cooldown_;

  for (int s = 0; s < n; ++s) {
    // ping-pong: read the current buffers, write every entry in [0, M) of
    // the alternate ones (source/lip ends + interior junctions), then flip;
    // sections beyond M are cleared by commit_ on M changes
    const double* __restrict fwd_ = fbuf_[cur].data();
    const double* __restrict bwd_ = bbuf_[cur].data();
    double* __restrict newf = fbuf_[cur ^ 1].data();
    double* __restrict newb = bbuf_[cur ^ 1].data();
    double* __restrict nfwd_ = nfbuf_[cur].data();
    double* __restrict nbwd_ = nbbuf_[cur].data();
    double* __restrict nf = nfbuf_[cur ^ 1].data();
    double* __restrict nb = nbbuf_[cur ^ 1].data();

    // source at the glottal end (pressure wave from glottal volume velocity)
    double src = flows[s] * src_scale;
    newf[0] = kGlottisRefl * bwd_[0] * kDamp + src;

    // lip end: lowpassed radiation reflection; radiated sound is the
    // differentiated transmitted pressure
    double lip_in = fwd_[M - 1] * kDamp;
    lip_lp += 0.55 * (lip_in - lip_lp);
    newb[M - 1] = lip_refl * lip_lp;
    double lip_out = lip_in + newb[M - 1];

    // interior scattering junctions, in the factored form
    //   d = k (fi - bi1);  newf = fi + d;  newb = bi1 + d
    // (algebraically equal to (1+k)fi - k bi1 / k fi + (1-k)bi1 with two
    // fewer multiplies per junction; rounding differs at ~1 ulp, which the
    // damped recurrence keeps bounded — end-to-end audio moves ~1e-12)
    for (int i = 0; i < M - 1; ++i) {
      double fi = fwd_[i] * kDamp;
      double bi1 = bwd_[i + 1] * kDamp;
      double d = k[i] * (fi - bi1);
      newf[i + 1] = fi + d;
      newb[i] = bi1 + d;
    }
    if (nasal_on) {
      // three-port junction with the nasal tract (admittances ~ areas)
      const int i = iv;
      double fi = fwd_[i] * kDamp;
      double bi1 = bwd_[i + 1] * kDamp;
      double nb0 = nbwd_[0] * kDamp;
      double pj = (y1 * fi + y2 * bi1 + y3 * nb0) * port_scale;
      newb[i] = pj - fi;
      newf[i + 1] = pj - bi1;
      nfwd_[0] = pj - nb0;
    }

    // nasal tract propagation + nostril radiation.  While the velar port is
    // open the 3-port junction above drives nfwd_[0]; when it closes, the
    // velar end becomes a (damped) closed-tube reflection so trapped energy
    // drains through the nostrils instead of freezing in nfwd_[0] and
    // re-driving the branch forever.  A cooldown bounds the extra work: once
    // the residual has decayed (~70 ms), the branch state clears and the
    // loop stops running.
    double nose_out = 0.0;
    if (nasal_on) cooldown = 3000;
    if (nasal_on || cooldown > 0) {
      constexpr int NN = kNasalSections;
      nf[0] = nasal_on ? nfwd_[0] : nbwd_[0] * kDamp;
      double nose_in = nfwd_[NN - 1] * kDamp;
      nose_lp += 0.45 * (nose_in - nose_lp);
      nb[NN - 1] = -0.80 * nose_lp;
      nose_out = nose_in + nb[NN - 1];
      for (int i = 0; i < NN - 1; ++i) {
        double fi = nfwd_[i] * kDamp;
        double bi1 = nbwd_[i + 1] * kDamp;
        double d = nk_[i] * (fi - bi1);
        nf[i + 1] = fi + d;
        nb[i] = bi1 + d;
      }
      if (!nasal_on && --cooldown == 0) {
        // clear through the restrict-qualified pointers themselves (they
        // cover all four buffers between them) — touching the same
        // storage via the member arrays inside the pointers' scope would
        // be undefined under restrict semantics and lets the optimizer
        // reorder the fill against the nf/nb stores above
        for (int i = 0; i < NN; ++i) {
          nfwd_[i] = 0.0;
          nbwd_[i] = 0.0;
          nf[i] = 0.0;
          nb[i] = 0.0;
        }
        nose_lp = 0.0;
      }
    }

    // frication: inject bandlimited noise downstream of a narrow
    // supraglottal constriction, scaled by the local flow estimate
    if (fric_amp > 0.0) {
      double u_c = (fwd_[fric_i] - bwd_[fric_i]);
      double nw = white(&nstate);
      fric_lp += 0.55 * (nw - fric_lp);
      double band = nw - fric_lp;  // highpassed noise
      int inj = std::min(fric_i + 1, M - 1);
      // saturating level estimate: no positive feedback loop possible
      double level = fast_tanh_pos(3.0 * std::abs(u_c));
      newf[inj] += band * fric_amp * level * 0.25;
    }

    cur ^= 1;  // the freshly written buffers become current

    // radiation: differentiate, add nasal output, DC-block
    double pressure = lip_out + 0.8 * nose_out;
    double radiated = pressure - lip_out_prev + 0.995 * radiated_prev;
    lip_out_prev = pressure;
    radiated_prev = radiated;
    out[s] = radiated;
  }

  lip_lp_ = lip_lp;
  lip_out_prev_ = lip_out_prev;
  radiated_prev_ = radiated_prev;
  nose_lp_ = nose_lp;
  fric_lp_ = fric_lp;
  noise_state_ = nstate;
  cur_ = cur;
  nasal_cooldown_ = cooldown;
}

// ---------------------------------------------------------------------------
// synthesizer
// ---------------------------------------------------------------------------

void Synthesizer::reset() {
  wg_.reset();
  glottis_state_.reset();
  has_state_ = false;
  has_tube_state_ = false;
  cur_tract_.fill(0.0);
  cur_glottis_.fill(0.0);
  ramp_cache_valid_ = false;
}

void Synthesizer::synth_ramp(const double* tract0, const double* glottis0,
                             const double* tract1, const double* glottis1,
                             int n, double* audio) {
  Tube t0, t1;
  if (ramp_cache_valid_ &&
      std::memcmp(ramp_cache_tract_.data(), tract0,
                  sizeof(ramp_cache_tract_)) == 0) {
    t0 = ramp_cache_tube_;
  } else {
    tract_to_tube(speaker_, tract0, &t0);
  }
  tract_to_tube(speaker_, tract1, &t1);
  std::memcpy(ramp_cache_tract_.data(), tract1, sizeof(ramp_cache_tract_));
  ramp_cache_tube_ = t1;
  ramp_cache_valid_ = true;
  wg_.set_ramp(t0, t1);
  double gp[kGlottisParams];
  double flows[kControlBlock];
  for (int s = 0; s < n; s += kControlBlock) {
    // control-rate commit: interpolate the tube/glottis params and derive
    // the expensive coefficients once per block (the params move slowly —
    // one cp frame spans 110 samples)
    double a = (n <= 1) ? 1.0 : (double)(s + 1) / n;
    wg_.blend(a);
    for (int i = 0; i < kGlottisParams; ++i)
      gp[i] = lerp(glottis0[i], glottis1[i], a);
    glottis_state_.prepare(speaker_, gp);
    int bn = std::min(kControlBlock, n - s);
    glottis_state_.step_block(bn, flows);
    wg_.step_block(bn, flows, audio + s);
  }
}

int Synthesizer::synth_block(const double* tract, const double* glottis,
                             int n_frames, int frame_steps, double* audio) {
  if (n_frames < 1 || frame_steps < 1) return 2;
  ScopedFtz ftz;
  reset();
  std::memcpy(cur_tract_.data(), tract, sizeof(cur_tract_));
  std::memcpy(cur_glottis_.data(), glottis, sizeof(cur_glottis_));
  has_state_ = true;
  for (int f = 1; f < n_frames; ++f) {
    const double* tr = tract + (size_t)f * kTractParams;
    const double* gl = glottis + (size_t)f * kGlottisParams;
    synth_ramp(cur_tract_.data(), cur_glottis_.data(), tr, gl, frame_steps,
               audio + (size_t)(f - 1) * frame_steps);
    std::memcpy(cur_tract_.data(), tr, sizeof(cur_tract_));
    std::memcpy(cur_glottis_.data(), gl, sizeof(cur_glottis_));
  }
  return 0;
}

int Synthesizer::add_tube(int n_samples, double* audio,
                          const double* tube_areas, const double* tube_lengths,
                          const double* glottis, double velum_opening_cm2) {
  ScopedFtz ftz;
  Tube target{};
  for (int i = 0; i < kTubeSections; ++i) {
    target.area_cm2[i] = clampd(tube_areas[i], 0.0, 15.0);
    target.length_cm[i] = tube_lengths ? tube_lengths[i] : 16.0 / kTubeSections;
    target.articulator[i] = kOtherArticulator;
  }
  target.velum_opening_cm2 = clampd(velum_opening_cm2, 0.0, 2.0);
  target.incisor_pos_cm = 15.0;
  target.tongue_tip_side_elevation = 0.0;
  target.total_length_cm = 0.0;
  for (int i = 0; i < kTubeSections; ++i)
    target.total_length_cm += target.length_cm[i];

  if (!has_tube_state_ || n_samples <= 0) {
    cur_tube_ = target;
    std::memcpy(cur_glottis_.data(), glottis, sizeof(cur_glottis_));
    has_tube_state_ = true;
    return 0;
  }
  wg_.set_ramp(cur_tube_, target);
  double gp[kGlottisParams];
  double flows[kControlBlock];
  for (int s = 0; s < n_samples; s += kControlBlock) {
    double a = (double)(s + 1) / n_samples;
    wg_.blend(a);
    for (int i = 0; i < kGlottisParams; ++i)
      gp[i] = lerp(cur_glottis_[i], glottis[i], a);
    glottis_state_.prepare(speaker_, gp);
    int bn = std::min(kControlBlock, n_samples - s);
    glottis_state_.step_block(bn, flows);
    wg_.step_block(bn, flows, audio + s);
  }
  cur_tube_ = target;
  std::memcpy(cur_glottis_.data(), glottis, sizeof(cur_glottis_));
  return 0;
}

// ---------------------------------------------------------------------------
// analysis / utility surface
// ---------------------------------------------------------------------------

void tract_transfer_function(const Speaker& spk, const double* tract,
                             int n_points, double* magnitude, double* phase) {
  // impulse response of the static tube through the waveguide, then a DFT at
  // n_points uniformly spaced frequencies up to Nyquist
  ScopedFtz ftz;
  Tube tube;
  tract_to_tube(spk, tract, &tube);
  Waveguide wg;
  wg.reset();
  wg.set_tube(tube);  // static tube: commit coefficients once
  constexpr int N = 4096;
  std::vector<double> h(N);
  for (int s = 0; s < N; ++s) {
    double flow = (s == 0) ? 1.0e4 : 0.0;  // impulse of glottal flow
    h[s] = wg.step(flow);
  }
  for (int k = 0; k < n_points; ++k) {
    double w = M_PI * (double)k / (double)n_points;  // 0..pi (Nyquist)
    double re = 0.0, im = 0.0;
    for (int s = 0; s < N; ++s) {
      re += h[s] * std::cos(w * s);
      im -= h[s] * std::sin(w * s);
    }
    magnitude[k] = std::sqrt(re * re + im * im);
    phase[k] = std::atan2(im, re);
  }
}

void input_tract_to_limited_tract(const Speaker& spk, const double* in,
                                  double* out) {
  std::memcpy(out, in, sizeof(double) * kTractParams);
  spk.clamp_tract(out);
}

void calc_tongue_root_automatically(const Speaker& spk, double* tract) {
  // linear coupling of the tongue root to the tongue body position
  double trx = 0.94 * tract[8] - 1.10;   // from TCX
  double try_ = 0.83 * tract[9] - 2.00;  // from TCY
  tract[14] = clampd(trx, spk.tract_params[14].min, spk.tract_params[14].max);
  tract[15] = clampd(try_, spk.tract_params[15].min, spk.tract_params[15].max);
}

int save_speaker(const Speaker& spk, const std::string& path) {
  std::ofstream out(path);
  if (!out) return 1;
  out << "# paule_tpu speaker definition\n[meta]\nname = " << spk.name << "\n";
  out << "[anatomy]\n";
  out << "base_length_cm = " << spk.base_length_cm << "\n";
  out << "fold_length_cm = " << spk.fold_length_cm << "\n";
  out << "nasal_length_cm = " << spk.nasal_length_cm << "\n";
  out << "[tract_map]\n";
  {
    const auto& m = spk.tract_map;
    out << "gain_body = " << m.gain_body << "\n";
    out << "exp_body = " << m.exp_body << "\n";
    out << "gain_blade = " << m.gain_blade << "\n";
    out << "exp_blade = " << m.exp_blade << "\n";
    out << "gain_tip = " << m.gain_tip << "\n";
    out << "exp_tip = " << m.exp_tip << "\n";
    out << "gain_root = " << m.gain_root << "\n";
    out << "exp_root = " << m.exp_root << "\n";
    out << "lip_factor = " << m.lip_factor << "\n";
  }
  if (spk.source.present()) {
    out << "[source]\n";
    out.precision(12);
    out << "deriv_mix = " << spk.source.deriv_mix << "\n";
    out << "skew_offset = " << spk.source.skew_offset << "\n";
    out << "aspiration_db = " << spk.source.aspiration_db << "\n";
    out.precision(6);
  }
  if (spk.tract_affine.present()) {
    const auto& ta = spk.tract_affine;
    out << "[tract_affine]\n";
    out.precision(12);
    for (int i = 0; i < kTubeSections; ++i) {
      out << "area " << i;
      for (int c = 0; c < ta.n_coef; ++c)
        out << " " << ta.area[i * ta.n_coef + c];
      out << "\n";
    }
    auto row = [&out, &ta](const char* name, const std::vector<double>& v) {
      if ((int)v.size() != ta.n_coef) return;
      out << name;
      for (double c : v) out << " " << c;
      out << "\n";
    };
    row("length", ta.length);
    row("incisor", ta.incisor);
    row("tongue_tip", ta.tongue_tip);
    row("velum", ta.velum);
    out.precision(6);
  }
  out << "[tract_params]\n";
  for (size_t i = 0; i < spk.tract_params.size(); ++i) {
    auto& p = spk.tract_params[i];
    out << i << " " << p.name << " " << p.min << " " << p.max << " "
        << p.neutral << "\n";
  }
  out << "[glottis_params]\n";
  for (size_t i = 0; i < spk.glottis_params.size(); ++i) {
    auto& p = spk.glottis_params[i];
    out << i << " " << p.name << " " << p.min << " " << p.max << " "
        << p.neutral << "\n";
  }
  out << "[phones]\n";
  for (auto& ph : spk.phones) {
    out << ph.name << " " << (ph.voiced ? 1 : 0) << " " << ph.time_constant_s;
    for (double v : ph.target) out << " " << v;
    out << "\n";
  }
  return 0;
}

void Synthesizer::tube_for(const double* tract, Tube* out) {
  if (!(ramp_cache_valid_ &&
        std::memcmp(ramp_cache_tract_.data(), tract,
                    sizeof(ramp_cache_tract_)) == 0)) {
    tract_to_tube(speaker_, tract, &ramp_cache_tube_);
    std::memcpy(ramp_cache_tract_.data(), tract, sizeof(ramp_cache_tract_));
    ramp_cache_valid_ = true;
  }
  *out = ramp_cache_tube_;
}

int Synthesizer::add_tract(int n_samples, double* audio, const double* tract,
                           const double* glottis) {
  ScopedFtz ftz;
  if (!has_state_ || n_samples <= 0) {
    std::memcpy(cur_tract_.data(), tract, sizeof(cur_tract_));
    std::memcpy(cur_glottis_.data(), glottis, sizeof(cur_glottis_));
    has_state_ = true;
    return 0;
  }
  synth_ramp(cur_tract_.data(), cur_glottis_.data(), tract, glottis,
             n_samples, audio);
  std::memcpy(cur_tract_.data(), tract, sizeof(cur_tract_));
  std::memcpy(cur_glottis_.data(), glottis, sizeof(cur_glottis_));
  return 0;
}

}  // namespace pts
