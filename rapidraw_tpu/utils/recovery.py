"""Failure detection / recovery (SURVEY §5.3).

Mirrors the reference's mechanisms:
  * crash-flag backend fallback — the reference writes a flag file before
    requesting the wgpu adapter and falls back to the GL backend if the
    flag survives a crash (gpu_processing.rs:158-165,236-238). Here the
    flag guards TPU runtime init; if a previous process died mid-init the
    next one pins JAX to CPU instead of hanging on a wedged tunnel.
  * generation-token cancellation — image loads / thumbnail walks /
    exports check a token and stop early (image_loader.rs:352-463,
    lib.rs:239-258, export_processing.rs:1006-1018).
"""

from __future__ import annotations

import os
import threading
from pathlib import Path


def _flag_path() -> Path:
    env = os.environ.get("RAPIDRAW_CACHE_DIR")
    if env and env.lower() == "none":
        # the documented disable-the-jit-cache sentinel (cli.py) is not a
        # literal path; the crash flag falls back to the home cache dir
        env = None
    d = Path(env) if env else Path.home() / ".cache" / "rapidraw_tpu"
    d.mkdir(parents=True, exist_ok=True)
    return d / "backend_crash_flag"


def guarded_backend_init() -> str:
    """Initialize the JAX backend behind a crash flag.

    Returns the platform actually initialized. If the flag file exists
    (a previous init never completed), force the CPU backend for this run;
    the flag is cleared after a successful CPU session start so the next
    run retries the accelerator.
    """
    import jax

    flag = _flag_path()
    if flag.exists():
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        try:
            flag.unlink()  # retry accelerator next run
        except OSError:
            pass
        return "cpu (crash-flag fallback)"
    try:
        flag.write_text("init")
    except OSError:
        return jax.devices()[0].platform
    try:
        platform = jax.devices()[0].platform
    finally:
        try:
            flag.unlink()
        except OSError:
            pass
    return platform


class CancellationToken:
    """Cooperative cancellation shared across threads."""

    def __init__(self):
        self._event = threading.Event()

    def cancel(self) -> None:
        self._event.set()

    @property
    def cancelled(self) -> bool:
        return self._event.is_set()
