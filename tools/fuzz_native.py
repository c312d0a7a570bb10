"""Fuzz the native C++ RAW decoders in disposable subprocesses.

The Python-level fuzz (tests/test_raw_fuzz.py) exercises the container
parsers, but a memory-safety bug in the native decoders (native/ljpeg.cc,
vendor_huff.cc, pana_oly.cc, crx.cc) would segfault the whole process —
the ValueError safety net can't catch that. This harness mirrors the
reference's reliance on rawler's fuzz hardening (Cargo.toml:27): each
batch of mutations runs in a child process; a crash kills only the child,
and the parent bisects to the exact (seed, trial) for reproduction.

Usage:
  python tools/fuzz_native.py --decoder all --trials 2000
  python tools/fuzz_native.py --child ljpeg --seed-file s.bin --start 0 --count 100

Exit code 0 = every mutation either decoded or raised ValueError.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DECODERS = ["ljpeg", "nikon", "pentax", "panasonic", "olympus", "crx", "phase_one"]


def _build_seeds(decoder: str) -> list[bytes]:
    """Valid streams per decoder, produced by the test-suite oracles —
    mutations of a valid stream reach far deeper than random bytes."""
    import numpy as np

    rng = np.random.default_rng(42)
    if decoder == "ljpeg":
        from tests.test_native_ljpeg import encode_ljpeg

        img = rng.integers(0, 65535, (32, 48), dtype=np.uint16)
        return [
            encode_ljpeg(img, precision=16),
            encode_ljpeg(img >> 4, precision=12, predictor=4),
            encode_ljpeg(rng.integers(0, 4095, (16, 64), np.uint16),
                         precision=12, ncomp=2),
        ]
    if decoder == "nikon":
        from tests.test_raw_containers import _encode_nikon_lossless12

        cfa = rng.integers(0, 4095, (16, 32), dtype=np.uint16)
        return [_encode_nikon_lossless12(cfa)]
    if decoder == "pentax":
        from tests.test_raw_containers import _encode_pentax

        cfa = rng.integers(0, 4095, (16, 32), dtype=np.uint16)
        return [_encode_pentax(cfa)]
    if decoder == "panasonic":
        from tests.test_raw_containers import _encode_rw2_stream

        return [_encode_rw2_stream(16, 56, rng)[0]]
    if decoder == "olympus":
        from tests.test_raw_containers import _encode_orf_predictive

        return [_encode_orf_predictive(16, 32, rng)[0]]
    if decoder == "crx":
        from rapidraw_tpu.native import crx_encode

        planes = rng.integers(0, 16383, (4, 16, 24), dtype=np.uint16)
        return [crx_encode(planes)]
    if decoder == "phase_one":
        from tests.test_iiq import _BitWriter, _encode_row

        pred = rng.integers(0, 8000, (16, 24)).astype(np.uint16)
        rows, lens = [], [0, 0]
        for r in range(16):
            bw = _BitWriter(False)
            _encode_row(bw, pred[r], lens)
            rows.append(bw.tobytes())
        return [b"".join(rows)]
    raise SystemExit(f"unknown decoder {decoder}")


def _decode_one(decoder: str, buf: bytes) -> None:
    from rapidraw_tpu import native

    if decoder == "ljpeg":
        native.ljpeg_decode(buf)
    elif decoder == "nikon":
        native.nikon_decode(buf, 32, 16, 2, 0, [0, 0, 0, 0], 12)
    elif decoder == "pentax":
        native.pentax_decode(buf, 32, 16, 12)
    elif decoder == "panasonic":
        native.panasonic_decode(buf, 56, 16)
    elif decoder == "olympus":
        native.olympus_decode(buf, 32, 32, 16)
    elif decoder == "crx":
        native.crx_decode(buf, 4, 24, 16)
    elif decoder == "phase_one":
        import numpy as np

        offs = np.linspace(0, max(len(buf) - 8, 0), 16).astype(np.uint32)
        native.phase_one_decode(buf, offs, 24, 16, 5, False)


def _mutate(seed: bytes, rng) -> bytes:
    buf = bytearray(seed)
    kind = rng.integers(0, 5)
    if kind == 0 and len(buf) > 4:  # byte flips
        for _ in range(int(rng.integers(1, 8))):
            buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
    elif kind == 1 and len(buf) > 8:  # truncate
        buf = buf[: int(rng.integers(1, len(buf)))]
    elif kind == 2:  # extend with noise
        buf += bytes(rng.integers(0, 256, int(rng.integers(1, 256)), dtype="u1"))
    elif kind == 3 and len(buf) > 8:  # overwrite a random word with extremes
        pos = int(rng.integers(0, len(buf) - 4))
        word = rng.choice([0, 0xFF, 0x7F, 0x80])
        buf[pos : pos + 4] = bytes([word] * 4)
    else:  # splice two regions
        if len(buf) > 16:
            a = int(rng.integers(0, len(buf) - 8))
            b = int(rng.integers(0, len(buf) - 8))
            buf[a : a + 8] = buf[b : b + 8]
    return bytes(buf)


def _run_child(decoder: str, seed_file: str, start: int, count: int) -> int:
    import numpy as np

    seed = Path(seed_file).read_bytes()
    for trial in range(start, start + count):
        rng = np.random.default_rng(trial)
        buf = _mutate(seed, rng)
        try:
            _decode_one(decoder, buf)
        except ValueError:
            pass
        except Exception as e:  # noqa: BLE001 — any other escape is a bug
            print(f"ESCAPE {decoder} trial={trial}: {type(e).__name__}: {e}",
                  flush=True)
            return 2
    return 0


def _run_parent(decoders: list[str], trials: int, batch: int) -> int:
    failures = 0
    with tempfile.TemporaryDirectory() as td:
        for dec in decoders:
            seeds = _build_seeds(dec)
            for si, seed in enumerate(seeds):
                sf = Path(td) / f"{dec}_{si}.bin"
                sf.write_bytes(seed)
                for start in range(0, trials, batch):
                    n = min(batch, trials - start)
                    proc = subprocess.run(
                        [sys.executable, __file__, "--child", dec,
                         "--seed-file", str(sf), "--start", str(start),
                         "--count", str(n)],
                        capture_output=True, text=True, timeout=600,
                        cwd=str(REPO),
                    )
                    if proc.returncode != 0:
                        failures += 1
                        sig = (f"signal {-proc.returncode}"
                               if proc.returncode < 0 else
                               f"exit {proc.returncode}")
                        print(f"FAIL {dec} seed={si} batch@{start} ({sig})")
                        print(proc.stdout[-500:], proc.stderr[-500:])
                        # bisect to the exact trial
                        for t in range(start, start + n):
                            p1 = subprocess.run(
                                [sys.executable, __file__, "--child", dec,
                                 "--seed-file", str(sf), "--start", str(t),
                                 "--count", "1"],
                                capture_output=True, text=True, timeout=120,
                                cwd=str(REPO),
                            )
                            if p1.returncode != 0:
                                print(f"  first failing trial: {t}")
                                break
                        break
                else:
                    print(f"ok {dec} seed={si}: {trials} mutations survived",
                          flush=True)
                    continue
    return 1 if failures else 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--decoder", default="all")
    ap.add_argument("--trials", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=500)
    ap.add_argument("--child", help="internal: run one batch in-process")
    ap.add_argument("--seed-file")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--count", type=int, default=100)
    args = ap.parse_args()

    if args.child:
        sys.exit(_run_child(args.child, args.seed_file, args.start, args.count))
    decs = DECODERS if args.decoder == "all" else [args.decoder]
    sys.exit(_run_parent(decs, args.trials, args.batch))


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    main()
