"""Bounded fuzz regression for the native C++ decoders.

Deep campaigns run via ``tools/fuzz_native.py`` (5000+ mutations per
decoder per seed, subprocess-isolated); this in-suite version pins the
contract on a small budget so a memory-safety regression in
native/{ljpeg,vendor_huff,pana_oly,crx,phase_one}.cc is caught by CI: every
mutation either decodes or raises ValueError, and a child-process crash
(signal) fails loudly here instead of killing the pytest process.
"""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
FUZZ = REPO / "tools" / "fuzz_native.py"


def _toolchain_available() -> bool:
    try:
        from rapidraw_tpu import native

        native.load("crx")
        return True
    except Exception:  # noqa: BLE001 — NativeBuildError or OSError
        return False


@pytest.mark.parametrize(
    "decoder", ["ljpeg", "nikon", "pentax", "panasonic", "olympus", "crx",
                "phase_one"]
)
def test_native_decoder_survives_mutations(decoder):
    if not _toolchain_available():
        pytest.skip("native toolchain unavailable")
    proc = subprocess.run(
        [sys.executable, str(FUZZ), "--decoder", decoder,
         "--trials", "120", "--batch", "120"],
        capture_output=True, text=True, timeout=300, cwd=str(REPO),
    )
    assert proc.returncode == 0, (
        f"{decoder} fuzz failed:\n{proc.stdout[-1500:]}\n{proc.stderr[-500:]}"
    )
