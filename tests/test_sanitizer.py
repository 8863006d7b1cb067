"""Sanitizer CI for the native C++ runtime (SURVEY.md §5: the reference has
no TSAN/ASAN story; the ctypes boundary here is raw pointers, so memory
safety must be machine-checked).

Builds native/src/selftest.cpp together with the runtime sources under
AddressSanitizer + UndefinedBehaviorSanitizer and runs it as a subprocess:
randomized codec round trips, chunked resume, parallel-vs-serial interleave
equivalence (threads included, so ASan also sees the threaded paths), and
the corrupt-input error sentinels.  Any sanitizer report fails the run.
"""

import os
import subprocess

import pytest

SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bwtmerge_tpu", "native", "src")
SOURCES = ["codec.cpp", "interleave.cpp", "spill.cpp", "selftest.cpp"]


@pytest.fixture(scope="module")
def selftest_bin(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("san") / "selftest")
    cmd = ["g++", "-O1", "-g", "-std=c++17",
           "-fsanitize=address,undefined", "-fno-sanitize-recover=all",
           "-o", out] + [os.path.join(SRC, s) for s in SOURCES] + ["-pthread"]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    assert proc.returncode == 0, f"sanitizer build failed:\n{proc.stderr}"
    return out


def test_native_selftest_under_asan_ubsan(selftest_bin):
    proc = subprocess.run([selftest_bin], capture_output=True, text=True,
                          timeout=300)
    assert proc.returncode == 0, (
        f"sanitized selftest failed (rc={proc.returncode}):\n"
        f"{proc.stdout}\n{proc.stderr[-4000:]}")
    assert "native selftest: OK" in proc.stdout
