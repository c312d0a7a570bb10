"""Adversarial-input robustness for every RAW container parser.

The reference inherits rawler's fuzz hardening (Cargo.toml:27); here the
contract is: `parse_raw` on arbitrary bytes either returns a RawFile or
raises ValueError (DngError / UnsupportedRawFormat are subclasses) — never
IndexError/struct.error/OverflowError/segfault, and never an absurd
allocation. Seeds are mutated real-ish headers so the fuzz actually
reaches the per-format parse paths, not just the sniffer.
"""

import struct

import numpy as np
import pytest

from rapidraw_tpu.io.containers import parse_raw


def _structured_dng() -> bytes:
    """A well-formed CFA DNG skeleton — mutations reach deep parse paths
    (this seed found the KeyError leaks the parse_raw safety net now
    converts)."""
    from tests.test_raw_containers import Ifd, build_tiff

    ifd = Ifd([
        (256, 3, [64]), (257, 3, [48]), (258, 3, [16]), (259, 3, [1]),
        (262, 3, [32803]), (273, 4, [200]), (279, 4, [6144]),
        (33422, 1, bytes([0, 1, 1, 2])), (50706, 1, bytes([1, 4, 0, 0])),
        (50714, 3, [100]), (50717, 3, [4095]),
    ])
    return build_tiff([ifd]) + bytes(8192)


def _structured_mrw() -> bytes:
    from tests.test_raw_containers import _build_mrw

    cfa = np.arange(48, dtype=np.uint16).reshape(6, 8) * 50
    return _build_mrw(cfa, packed=True)


def _structured_tiffcfa() -> bytes:
    """Vendor TIFF routed to parse_tiff_cfa (Make=SAMSUNG + WB tags)."""
    from tests.test_raw_containers import Ifd, build_tiff

    cfa = (np.arange(48, dtype=np.uint16) * 999).reshape(6, 8)
    ifd = Ifd([
        (256, 3, [8]), (257, 3, [6]), (258, 3, [16]), (259, 3, [1]),
        (271, 2, "SAMSUNG"), (273, 4, ("blob", cfa.tobytes())),
        (279, 4, [cfa.size * 2]), (0xA021, 4, [512, 256, 256, 256]),
    ])
    return build_tiff([ifd])


def _structured_iiq() -> bytes:
    from tests.test_iiq import _build_iiq

    rng = np.random.default_rng(9)
    pred = rng.integers(0, 4000, (6, 16)).astype(np.uint16)
    return _build_iiq(pred, fmt=5, black=32)


def _seeds() -> list[bytes]:
    """Magic prefixes that route into each parser + one deep DNG."""
    tiff_le = b"II*\0" + struct.pack("<I", 8) + struct.pack("<H", 3) + b"\x01\x02" * 20
    tiff_be = b"MM\0*" + struct.pack(">I", 8) + struct.pack(">H", 3) + b"\x01\x02" * 20
    return [
        _structured_dng(),
        tiff_le,
        tiff_be,
        b"II*\0\x10\0\0\0CR\x02\0" + b"\x07" * 52,            # CR2
        b"IIU\0\x18\0\0\0" + b"\x55" * 56,                     # RW2
        b"IIRO\x08\0\0\0" + b"\x4f" * 56,                      # ORF
        b"MMOR\0\0\0\x08" + b"\x52" * 56,                      # ORF big-endian
        b"FUJIFILMCCD-RAW 0201FF129502" + b"\0" * 36,          # RAF
        b"\0\0\0\x18ftypcrx \0\0\0\x01crx isom" + b"\x33" * 40,  # CR3
        b"FOVb" + b"\x01\0\0\0" + b"\x99" * 56,                # X3F (refusal)
        _structured_mrw(),
        _structured_tiffcfa(),
        _structured_iiq(),
        b"II\x1a\0\0\0HEAPCCDR" + b"\x11" * 48,                # CRW (refusal)
        b"\0\0\0\x14ftypisom\0\0\0\x01" + b"\x44" * 44,        # generic BMFF
    ]


@pytest.mark.parametrize("seed_idx", range(len(_seeds())))
def test_parse_raw_never_escapes_valueerror(seed_idx):
    seed = _seeds()[seed_idx]
    rng = np.random.default_rng(1000 + seed_idx)
    for trial in range(120):
        buf = bytearray(seed)
        # grow some trials so offset fields can point inside the buffer
        if trial % 3 == 0:
            buf += bytes(rng.integers(0, 256, rng.integers(1, 512), dtype=np.uint8))
        # mutate a few random bytes, preserving the first 4 magic bytes
        for _ in range(rng.integers(1, 9)):
            pos = int(rng.integers(4, len(buf)))
            buf[pos] = int(rng.integers(0, 256))
        try:
            raw = parse_raw(bytes(buf), ext="")
        except ValueError:
            continue  # DngError / UnsupportedRawFormat included
        except MemoryError:
            pytest.fail(f"seed {seed_idx} trial {trial}: unbounded allocation")
        # a successful parse must be self-consistent
        assert raw.cfa.ndim in (2, 3)
        assert raw.cfa.size < 1 << 28


def test_parse_raw_truncations():
    """Prefix truncations must decode or raise ValueError — nothing else
    (the structured DNG's zero-padding tail means some truncations still
    parse; the contract is clean failure, not guaranteed failure)."""
    for seed in _seeds():
        for n in range(0, len(seed), 7):
            try:
                parse_raw(seed[:n], ext="")
            except ValueError:
                pass


def test_parse_raw_pure_noise():
    rng = np.random.default_rng(7)
    for trial in range(50):
        blob = bytes(rng.integers(0, 256, rng.integers(0, 2048), dtype=np.uint8))
        with pytest.raises(ValueError):
            parse_raw(blob, ext="dng")
