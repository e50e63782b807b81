"""Build driver for the C++ synthesizer.

Compiles ``csrc/*.cpp`` into ``_build/libptsynth.so`` with g++ on first use
(or when sources are newer than the library).  CMakeLists.txt is also
provided for standalone builds; this driver keeps ``pip install``-free
environments working.
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
CSRC = os.path.join(HERE, "csrc")
BUILD_DIR = os.path.join(HERE, "_build")
LIB_NAME = "libptsynth.so" if not sys.platform.startswith("darwin") else "libptsynth.dylib"
LIB_PATH = os.path.join(BUILD_DIR, LIB_NAME)

SOURCES = ["model.cpp", "files.cpp", "api.cpp"]
CPU_TAG_PATH = os.path.join(BUILD_DIR, "cpu.tag")


def _cpu_tag():
    """Fingerprint of the host CPU's ISA features.  The library builds with
    -march=native, so an artifact cached on a shared filesystem must not be
    reused on a machine with different features (SIGILL otherwise)."""
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    feats = line
                    break
    except OSError:
        # no /proc (macOS): fall back to the full platform string; without
        # per-feature info we also don't emit -march=native (see build()),
        # so the artifact is portable across same-arch machines anyway
        feats = platform.platform() + platform.processor()
    return hashlib.sha256(
        (platform.machine() + feats).encode()).hexdigest()[:16]


def _needs_build():
    if not os.path.exists(LIB_PATH):
        return True
    try:
        with open(CPU_TAG_PATH) as fh:
            if fh.read().strip() != _cpu_tag():
                return True
    except OSError:
        return True
    lib_mtime = os.path.getmtime(LIB_PATH)
    headers = [f for f in os.listdir(CSRC) if f.endswith(".h")]
    for src in SOURCES + headers:
        if os.path.getmtime(os.path.join(CSRC, src)) > lib_mtime:
            return True
    return False


def build(force=False, verbose=False):
    """Compile the synthesizer shared library; returns its path."""
    if not force and not _needs_build():
        return LIB_PATH
    os.makedirs(BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-std=c++17", "-O3", "-fPIC", "-shared",
        # -fno-math-errno lets sqrt inline to the hardware instruction (the
        # per-sample loop carries several sqrts); -fno-trapping-math lets
        # floor/float<->int casts vectorize (gcc refuses to emit vroundpd
        # in SIMD loops while FP-exception semantics must be preserved) —
        # results stay IEEE, only trap delivery is given up, and the
        # synthesis loops already run under FTZ
        "-fno-math-errno", "-fno-trapping-math",
        "-Wall", "-Wextra",
        *(os.path.join(CSRC, s) for s in SOURCES),
        "-o", LIB_PATH,
    ]
    if sys.platform.startswith("linux"):
        # native codegen is safe here: the artifact is keyed to the host's
        # CPU-feature fingerprint (cpu.tag) and rebuilt on mismatch; Apple
        # clang rejects -march=native, so macOS builds stay generic
        cmd.insert(5, "-march=native")
    if verbose:
        print("[paule_tpu.synth] building:", " ".join(cmd))
    result = subprocess.run(cmd, capture_output=True, text=True)
    if result.returncode != 0:
        raise RuntimeError(
            f"synthesizer build failed:\n{result.stderr}\n{result.stdout}")
    with open(CPU_TAG_PATH, "w") as fh:
        fh.write(_cpu_tag())
    return LIB_PATH


if __name__ == "__main__":
    print(build(force="--force" in sys.argv, verbose=True))
