"""Memory-safety gate for the native layer (ASan + UBSan).

Reference medaka valgrind-memchecks its C kernels
(``Makefile:237-248``); this is the equivalent for the seven
medaka_tpu .cpp sources, driven through the real ctypes marshalling
paths by ``tests/asan_driver.py`` in a sanitizer-preloaded subprocess.
"""
import os
import pathlib
import subprocess
import sys

import pytest

HERE = pathlib.Path(__file__).parent
WORKFLOW = "/root/reference/medaka/test/data/workflow"


def _sanitizer_runtime(name):
    out = subprocess.run(
        ["gcc", "-print-file-name=" + name],
        capture_output=True, text=True)
    path = out.stdout.strip()
    return path if os.path.sep in path and os.path.exists(path) else None


@pytest.mark.skipif(
    _sanitizer_runtime("libasan.so") is None,
    reason="libasan runtime not available")
def test_native_layer_under_asan(tmp_path):
    from medaka_tpu import mapping

    bam = str(tmp_path / "calls.bam")
    mapping.align_reads(
        WORKFLOW + "/reads.fq.gz", WORKFLOW + "/reference.fasta", bam,
        threads=4)

    env = dict(os.environ)
    env["MEDAKA_TPU_SANITIZE"] = "1"
    env["LD_PRELOAD"] = ":".join(
        p for p in (_sanitizer_runtime("libasan.so"),
                    _sanitizer_runtime("libubsan.so")) if p)
    # leaks: see asan_driver docstring. halt_on_error ensures a finding
    # turns into a nonzero exit code, failing this test.
    env["ASAN_OPTIONS"] = "detect_leaks=0:halt_on_error=1"
    env["UBSAN_OPTIONS"] = "halt_on_error=1:print_stacktrace=1"
    env["PYTHONPATH"] = str(HERE.parent) + ":" + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(HERE / "asan_driver.py"), bam],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(HERE.parent))
    output = proc.stdout + proc.stderr
    assert proc.returncode == 0, output
    assert "ASAN_DRIVER_OK" in output, output
    assert "ERROR: AddressSanitizer" not in output, output
    assert "runtime error" not in output, output
