"""Native (C++) host-side kernels: pairwise alignment and POA.

The shared library is built on demand with g++ (no network, no external
deps) and cached next to the sources keyed by a source hash. Public
Python API:

- :func:`align` — affine-gap alignment (modes nw/hw/sw, optional band).
- :func:`edit_distance` — banded unit-cost distance with band doubling.
- :func:`poa_consensus` — partial-order-alignment consensus of reads.

These replace the reference's parasail, edlib and spoa dependencies
(reference ``medaka/align.py``, ``medaka/smolecule.py:164-226``).
"""
from __future__ import annotations

import ctypes
import dataclasses
import hashlib
import os
import subprocess
import threading
from typing import List, Optional, Sequence

_SRC_DIR = os.path.join(os.path.dirname(__file__), "src")
_SOURCES = ("align.cpp", "poa.cpp")
_LOCK = threading.Lock()
_LIB = None


class NativeBuildError(RuntimeError):
    """Raised when the native library cannot be built or loaded."""


def _source_hash() -> str:
    h = hashlib.sha256()
    for name in _SOURCES:
        with open(os.path.join(_SRC_DIR, name), "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:16]


def _build() -> str:
    tag = _source_hash()
    out = os.path.join(_SRC_DIR, "..", "_libmt_{}.so".format(tag))
    out = os.path.abspath(out)
    if os.path.exists(out):
        return out
    srcs = [os.path.join(_SRC_DIR, s) for s in _SOURCES]
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", out + ".tmp", *srcs]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, text=True, timeout=300)
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        stderr = getattr(e, "stderr", "")
        raise NativeBuildError(
            "Failed to build native library: {}\n{}".format(e, stderr))
    os.replace(out + ".tmp", out)
    return out


class _MtAlignment(ctypes.Structure):
    _fields_ = [
        ("score", ctypes.c_int32),
        ("ref_start", ctypes.c_int32),
        ("ref_end", ctypes.c_int32),
        ("query_start", ctypes.c_int32),
        ("query_end", ctypes.c_int32),
        ("cigar", ctypes.c_void_p),
    ]


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        lib = ctypes.CDLL(_build())
        lib.mt_align.restype = ctypes.c_int
        lib.mt_align.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(_MtAlignment)]
        lib.mt_edit_distance.restype = ctypes.c_int
        lib.mt_edit_distance.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_int]
        lib.mt_poa_consensus.restype = ctypes.c_int
        lib.mt_poa_consensus.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int]
        lib.mt_free.restype = None
        lib.mt_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib


MODES = {"nw": 0, "hw": 1, "sw": 2, "shw": 3}


@dataclasses.dataclass
class Alignment:
    """Result of a pairwise alignment."""

    score: int
    cigar: str
    ref_start: int
    ref_end: int
    query_start: int
    query_end: int


def align(query: str, ref: str, mode: str = "nw", match: int = 2,
          mismatch: int = 4, gap_open: int = 4, gap_extend: int = 2,
          band: int = 0) -> Alignment:
    """Affine-gap pairwise alignment.

    :param mode: 'nw' global, 'hw' query-global/ref-free ends (infix),
        'sw' local, 'shw' ref-start anchored with free ref end (prefix).
    :param band: net diagonal drift bound; 0 = full DP.
    """
    lib = _load()
    res = _MtAlignment()
    q = query.encode()
    r = ref.encode()
    rv = lib.mt_align(
        q, len(q), r, len(r), match, mismatch, gap_open, gap_extend,
        MODES[mode], band, ctypes.byref(res))
    if rv != 0:
        raise NativeBuildError("mt_align failed")
    cigar = ctypes.cast(res.cigar, ctypes.c_char_p).value or b""
    lib.mt_free(res.cigar)
    return Alignment(
        score=res.score, cigar=cigar.decode(),
        ref_start=res.ref_start, ref_end=res.ref_end,
        query_start=res.query_start, query_end=res.query_end)


def edit_distance(a: str, b: str, max_k: int = -1) -> int:
    """Unit-cost edit distance (banded, band-doubling); -1 if > max_k."""
    lib = _load()
    ab = a.encode()
    bb = b.encode()
    return lib.mt_edit_distance(ab, len(ab), bb, len(bb), max_k)


def poa_consensus(seqs: Sequence[str], match: int = 2, mismatch: int = 4,
                  gap: int = 4) -> str:
    """Partial-order-alignment consensus of sequences."""
    if not seqs:
        return ""
    lib = _load()
    enc = [s.encode() for s in seqs]
    arr = (ctypes.c_char_p * len(enc))(*enc)
    lens = (ctypes.c_int * len(enc))(*[len(s) for s in enc])
    cap = 2 * max(len(s) for s in enc) + 16
    out = ctypes.create_string_buffer(cap)
    n = lib.mt_poa_consensus(
        arr, lens, len(enc), match, mismatch, gap, out, cap)
    if n < 0:
        raise NativeBuildError("mt_poa_consensus failed")
    return out.value.decode()


def available() -> bool:
    """True when the native library can be built/loaded."""
    try:
        _load()
        return True
    except NativeBuildError:
        return False
