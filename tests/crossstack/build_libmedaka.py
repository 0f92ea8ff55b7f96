"""Build a minimal `libmedaka` cffi module from the REFERENCE C sources.

The cross-stack parity harness runs the reference medaka decode code,
which needs `libmedaka.lib.variant_columns` (the reference's own
`src/medaka_rnn_variants.c`, compiled verbatim from /root/reference —
not copied into this repo) plus the `plp_bases`/`featlen` constants the
reference's `common.py` reads at import time.

The built extension is cached under ``tests/crossstack/_build``.
"""
import os
import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent
BUILD_DIR = HERE / '_build'
REF_SRC = pathlib.Path('/root/reference/src/medaka_rnn_variants.c')

CDEF = """
void variant_columns(
    size_t* minor, wchar_t* reference, wchar_t* prediction,
    bool* out, size_t len);
extern const char plp_bases[];
extern const size_t featlen;
"""

SOURCE = """
#include <stddef.h>
#include <stdbool.h>
#include <wchar.h>

// constants mirrored from the reference medaka_counts.h (they are
// `static` there, so cannot be linked from the header directly)
const char plp_bases[] = "acgtACGTdD";
const size_t featlen = 10;

void variant_columns(
    size_t* minor, wchar_t* reference, wchar_t* prediction,
    bool* out, size_t len);
"""


def build():
    """Compile the module if missing; return the build dir to add to path."""
    BUILD_DIR.mkdir(exist_ok=True)
    existing = list(BUILD_DIR.glob('libmedaka*.so'))
    if existing and existing[0].stat().st_mtime >= REF_SRC.stat().st_mtime:
        return str(BUILD_DIR)
    import cffi
    ffi = cffi.FFI()
    ffi.cdef(CDEF)
    ffi.set_source(
        'libmedaka', SOURCE, sources=[str(REF_SRC)],
        extra_compile_args=['-O2'])
    ffi.compile(tmpdir=str(BUILD_DIR), verbose=False)
    return str(BUILD_DIR)


if __name__ == '__main__':
    print(build())
