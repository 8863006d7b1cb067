"""Differential tests against the ACTUAL reference binary.

The reference (jltsiren/bwt-merge) is compiled from /root/reference against
the mini-sdsl shim (scripts/refbuild/sdsl/ — our byte-compatible subset of
the public SDSL formats), then both tools run the same merges/conversions
and every output file is compared BYTE FOR BYTE.  This is the BASELINE.json
acceptance gate ("bit-exact native output vs the reference") closed with
the reference itself rather than hand-derived goldens.

Skipped when the reference sources or g++ are unavailable.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from bwtmerge_tpu.formats import write_bwt
from bwtmerge_tpu.models import oracle
from bwtmerge_tpu.models.fmi import FMI

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = os.environ.get("BWTMERGE_REF", "/root/reference")
BIN = os.path.join(REPO, "scripts", "refbuild", "bin")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_SRC, "bwt_merge.cpp"))
    or shutil.which("g++") is None,
    reason="reference sources or g++ unavailable")


@pytest.fixture(scope="module")
def ref_bins():
    merge = os.path.join(BIN, "bwt_merge")
    if not os.path.exists(merge):
        subprocess.run(
            ["sh", os.path.join(REPO, "scripts", "refbuild",
                                "build_reference.sh")],
            check=True, capture_output=True)
    return {t: os.path.join(BIN, t)
            for t in ("bwt_merge", "bwt_convert", "bwt_inspect")}


@pytest.fixture
def rng():
    return np.random.default_rng(99)


def _write_pieces(tmp_path, rng, n_pieces=3, reads=25, max_len=40):
    paths, fmis = [], []
    for i in range(n_pieces):
        C = oracle.random_collection(rng, reads, max_len)
        f = FMI.from_runs(oracle.build_bwt(C))
        p = str(tmp_path / f"p{i}.sga")
        write_bwt(p, "sga", f.runs, f.alpha)
        paths.append(p)
        fmis.append(f)
    return paths, fmis


def _ours(args):
    from bwtmerge_tpu.cli.bwt_merge import main as merge_main

    assert merge_main(args) == 0


def test_pairwise_merge_native_byte_identical(tmp_path, rng, ref_bins):
    paths, _ = _write_pieces(tmp_path, rng, 2)
    ref_out = str(tmp_path / "ref.native")
    our_out = str(tmp_path / "ours.native")
    subprocess.run([ref_bins["bwt_merge"], "-i", "sga", "-o", "native",
                    paths[0], paths[1], ref_out],
                   check=True, capture_output=True)
    _ours([paths[0], paths[1], our_out, "-i", "sga", "-o", "native",
           "--quiet", "--backend", "numpy", "-d", str(tmp_path)])
    assert open(ref_out, "rb").read() == open(our_out, "rb").read()


def test_kway_merge_sga_byte_identical(tmp_path, rng, ref_bins):
    paths, _ = _write_pieces(tmp_path, rng, 3)
    ref_out = str(tmp_path / "ref.sga")
    our_out = str(tmp_path / "ours.sga")
    subprocess.run([ref_bins["bwt_merge"], "-i", "sga", "-o", "sga"]
                   + paths + [ref_out], check=True, capture_output=True)
    # the jax k-way pairwise-decomposition engine on the CPU mesh
    _ours(paths + [our_out, "-i", "sga", "-o", "sga", "--quiet",
                   "--backend", "jax", "--fold", "kway",
                   "-d", str(tmp_path)])
    assert open(ref_out, "rb").read() == open(our_out, "rb").read()


def test_merge_verification_counts_agree(tmp_path, rng, ref_bins):
    paths, fmis = _write_pieces(tmp_path, rng, 2)
    pat_file = str(tmp_path / "pats.txt")
    pats = []
    for f in fmis:
        seq = f.extract_sequence(0)
        pats.append("".join("$ACGTN"[c] for c in seq[:6]))
    with open(pat_file, "w") as fh:
        fh.write("\n".join(pats) + "\n")
    out = str(tmp_path / "ref_v.native")
    res = subprocess.run(
        [ref_bins["bwt_merge"], "-i", "sga", "-v", pat_file,
         paths[0], paths[1], out],
        check=True, capture_output=True, text=True)
    assert "Verification successful" in res.stdout


@pytest.mark.parametrize("fmt", ["native", "ropebwt", "rfm", "sdsl",
                                 "plain_default", "plain_sorted"])
def test_convert_byte_identical(tmp_path, rng, ref_bins, fmt):
    paths, _ = _write_pieces(tmp_path, rng, 1)
    from bwtmerge_tpu.cli.bwt_convert import main as convert_main

    ref_out = str(tmp_path / f"ref.{fmt}")
    our_out = str(tmp_path / f"ours.{fmt}")
    subprocess.run([ref_bins["bwt_convert"], "-i", "sga", "-o", fmt,
                    paths[0], ref_out], check=True, capture_output=True)
    assert convert_main([paths[0], our_out, "-i", "sga", "-o", fmt]) == 0
    assert open(ref_out, "rb").read() == open(our_out, "rb").read()


def test_roundtrip_through_reference(tmp_path, rng, ref_bins):
    # OUR native file must load in the REFERENCE binary and convert back
    # to the same SGA bytes (cross-tool interchange, both directions)
    paths, _ = _write_pieces(tmp_path, rng, 1)
    from bwtmerge_tpu.cli.bwt_convert import main as convert_main

    ours_native = str(tmp_path / "ours.native")
    assert convert_main([paths[0], ours_native, "-i", "sga",
                         "-o", "native"]) == 0
    back = str(tmp_path / "back.sga")
    subprocess.run([ref_bins["bwt_convert"], "-i", "native", "-o", "sga",
                    ours_native, back], check=True, capture_output=True)
    assert open(back, "rb").read() == open(paths[0], "rb").read()


def test_deep_kway_merge_byte_identical(tmp_path, rng, ref_bins):
    # 5 inputs, mixed content sizes, native output — the reference left
    # fold vs our pairwise-decomposition fold, byte for byte
    paths, _ = _write_pieces(tmp_path, rng, 5, reads=18, max_len=35)
    ref_out = str(tmp_path / "ref5.native")
    our_out = str(tmp_path / "ours5.native")
    subprocess.run([ref_bins["bwt_merge"], "-i", "sga", "-o", "native"]
                   + paths + [ref_out], check=True, capture_output=True)
    _ours(paths + [our_out, "-i", "sga", "-o", "native", "--quiet",
                   "--backend", "jax", "--fold", "kway",
                   "-d", str(tmp_path)])
    assert open(ref_out, "rb").read() == open(our_out, "rb").read()


def test_low_memory_chain_matches_reference(tmp_path, rng, ref_bins):
    paths, _ = _write_pieces(tmp_path, rng, 3)
    ref_out = str(tmp_path / "refl.sga")
    our_out = str(tmp_path / "oursl.sga")
    subprocess.run([ref_bins["bwt_merge"], "-i", "sga", "-o", "sga"]
                   + paths + [ref_out], check=True, capture_output=True)
    _ours(paths + [our_out, "-i", "sga", "-o", "sga", "--quiet",
                   "--backend", "jax", "--low-memory", "--fold", "chain",
                   "-d", str(tmp_path)])
    assert open(ref_out, "rb").read() == open(our_out, "rb").read()
