"""Thumbnail throughput: serial per-path vs batched develop (real TPU).

12 same-shape edited JPEGs on tmpfs, rendered at 720 px: the serial path
launches one develop per image; generate_thumbnails groups the bucket into
develop_batch launches (VERDICT r4 #5 — file_management.rs:1440-1507's
worker pool exists for exactly this throughput).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/prof_thumbs.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import shutil
import tempfile
import time
from pathlib import Path

import numpy as np

N = 12


def main():
    from PIL import Image

    from rapidraw_tpu.io.sidecar import save_sidecar
    from rapidraw_tpu.library.thumbnails import generate_thumbnail, generate_thumbnails

    base = Path("/dev/shm" if Path("/dev/shm").is_dir() else tempfile.gettempdir())
    root = Path(tempfile.mkdtemp(prefix="rr_thumbs_", dir=base))
    try:
        rng = np.random.default_rng(0)
        paths = []
        for i in range(N):
            p = root / f"t{i:02d}.jpg"
            Image.fromarray(
                (rng.random((1365, 2048, 3)) * 255).astype(np.uint8)
            ).save(p, quality=92)
            save_sidecar(p, {"adjustments": {
                "exposure": 0.2 + 0.05 * i, "contrast": 15,
                "saturation": 10, "toneMapper": "agx"}})
            paths.append(str(p))

        # warm compiles on both routes (full passes: compiles + caches)
        for p in paths:
            generate_thumbnail(p, resolution=720)
        generate_thumbnails(paths, resolution=720)

        t0 = time.perf_counter()
        for p in paths:
            generate_thumbnail(p, resolution=720)
        serial = time.perf_counter() - t0

        t0 = time.perf_counter()
        out = generate_thumbnails(paths, resolution=720)
        batched = time.perf_counter() - t0
        assert len(out) == N

        print(f"serial:  {serial:.2f}s = {N/serial:.2f} thumbs/s", flush=True)
        print(f"batched: {batched:.2f}s = {N/batched:.2f} thumbs/s "
              f"({serial/batched:.2f}x)", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
