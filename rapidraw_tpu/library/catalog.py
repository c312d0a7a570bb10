"""Folder/file catalog operations.

Port of file_management.rs's library core: folder tree with lazy child scan
(:806-998), image listing (flat + recursive), file ops that keep sidecars
associated (copy/move/rename/delete, :1854-2053), virtual copies
(parse_virtual_path :165-196), ratings and color labels stored on the
.rrdata sidecar, and albums (:533-789) as JSON path collections.
"""

from __future__ import annotations

import json
import shutil
from dataclasses import dataclass
from pathlib import Path

from rapidraw_tpu.io.loader import RAW_EXTENSIONS, parse_virtual_path
from rapidraw_tpu.io.sidecar import SIDECAR_EXT, load_sidecar, save_sidecar, sidecar_path

LDR_EXTENSIONS = {"jpg", "jpeg", "png", "tif", "tiff", "webp", "bmp", "gif"}
SUPPORTED_EXTENSIONS = LDR_EXTENSIONS | RAW_EXTENSIONS


def is_supported_image(path: str | Path) -> bool:
    return Path(str(path)).suffix.lower().lstrip(".") in SUPPORTED_EXTENSIONS


@dataclass
class FolderNode:
    path: str
    name: str
    has_children: bool
    children: list | None = None  # lazy (file_management.rs:806-998)


def scan_folder(path: str | Path) -> FolderNode:
    p = Path(path)
    sub = [d for d in p.iterdir() if d.is_dir() and not d.name.startswith(".")] if p.is_dir() else []
    return FolderNode(str(p), p.name, bool(sub))


def folder_children(path: str | Path) -> list[FolderNode]:
    p = Path(path)
    out = []
    if p.is_dir():
        for d in sorted(p.iterdir()):
            if d.is_dir() and not d.name.startswith("."):
                out.append(scan_folder(d))
    return out


def list_images(path: str | Path, recursive: bool = False) -> list[str]:
    p = Path(path)
    it = p.rglob("*") if recursive else p.glob("*")
    files = [str(f) for f in it if f.is_file() and is_supported_image(f)]
    files.sort()
    # expand virtual copies recorded on sidecars
    expanded = []
    for f in files:
        expanded.append(f)
        meta = load_sidecar(f)
        for vc in meta.get("virtualCopies", []) or []:
            expanded.append(f"{f}?vc={vc}")
    return expanded


# ---- file ops with sidecar association (file_management.rs:1854-2053) -----


def _associated_files(path: Path) -> list[Path]:
    out = [path]
    sc = sidecar_path(path)
    if sc.exists():
        out.append(sc)
    return out


def copy_image(src: str | Path, dst_dir: str | Path) -> str:
    src = Path(str(parse_virtual_path(str(src))[0]))
    dst_dir = Path(dst_dir)
    dst_dir.mkdir(parents=True, exist_ok=True)
    for f in _associated_files(src):
        shutil.copy2(f, dst_dir / f.name)
    return str(dst_dir / src.name)


def move_image(src: str | Path, dst_dir: str | Path) -> str:
    src = Path(str(parse_virtual_path(str(src))[0]))
    dst_dir = Path(dst_dir)
    dst_dir.mkdir(parents=True, exist_ok=True)
    for f in _associated_files(src):
        shutil.move(str(f), str(dst_dir / f.name))
    return str(dst_dir / src.name)


def rename_image(src: str | Path, new_stem: str) -> str:
    src = Path(str(parse_virtual_path(str(src))[0]))
    dst = src.with_name(new_stem + src.suffix)
    src.rename(dst)
    sc = sidecar_path(src)
    if sc.exists():
        sc.rename(dst.parent / (dst.name + SIDECAR_EXT))
    return str(dst)


def delete_image(src: str | Path) -> None:
    src = Path(str(parse_virtual_path(str(src))[0]))
    for f in _associated_files(src):
        f.unlink(missing_ok=True)


# ---- virtual copies --------------------------------------------------------


def create_virtual_copy(src: str | Path) -> str:
    """Register a new virtual copy id on the sidecar; returns its path."""
    real = str(parse_virtual_path(str(src))[0])
    meta = load_sidecar(real)
    vcs = list(meta.get("virtualCopies", []) or [])
    next_id = (max(vcs) + 1) if vcs else 1
    vcs.append(next_id)
    meta["virtualCopies"] = vcs
    save_sidecar(real, meta)
    return f"{real}?vc={next_id}"


# ---- ratings / color labels ------------------------------------------------


def set_rating(path: str | Path, rating: int) -> None:
    real = str(parse_virtual_path(str(path))[0])
    meta = load_sidecar(real)
    meta["rating"] = max(0, min(int(rating), 5))
    save_sidecar(real, meta)


def set_color_label(path: str | Path, label: str | None) -> None:
    real = str(parse_virtual_path(str(path))[0])
    meta = load_sidecar(real)
    meta["colorLabel"] = label
    save_sidecar(real, meta)


def get_rating(path: str | Path) -> int:
    return int(load_sidecar(str(parse_virtual_path(str(path))[0])).get("rating") or 0)


# ---- tags on sidecars (tagging.rs:416-540) ---------------------------------


def add_tags(path: str | Path, tags: list[str]) -> list[str]:
    real = str(parse_virtual_path(str(path))[0])
    meta = load_sidecar(real)
    current = list(meta.get("tags") or [])
    for t in tags:
        if t and t not in current:
            current.append(t)
    meta["tags"] = current
    save_sidecar(real, meta)
    return current


def remove_tags(path: str | Path, tags: list[str]) -> list[str]:
    real = str(parse_virtual_path(str(path))[0])
    meta = load_sidecar(real)
    current = [t for t in (meta.get("tags") or []) if t not in set(tags)]
    meta["tags"] = current
    save_sidecar(real, meta)
    return current


def clear_tags(path: str | Path) -> None:
    real = str(parse_virtual_path(str(path))[0])
    meta = load_sidecar(real)
    meta["tags"] = []
    save_sidecar(real, meta)


def get_tags(path: str | Path) -> list[str]:
    return list(load_sidecar(str(parse_virtual_path(str(path))[0])).get("tags") or [])


# ---- albums (file_management.rs:533-789) -----------------------------------


class Albums:
    """JSON-file album store: {name: [image paths]}."""

    def __init__(self, store_path: str | Path):
        self.store_path = Path(store_path)
        self._data: dict[str, list[str]] = {}
        if self.store_path.exists():
            try:
                data = json.loads(self.store_path.read_text())
                if isinstance(data, dict):
                    self._data = {k: list(v) for k, v in data.items()}
            except (OSError, json.JSONDecodeError):
                pass

    def _save(self) -> None:
        self.store_path.parent.mkdir(parents=True, exist_ok=True)
        self.store_path.write_text(json.dumps(self._data, indent=2))

    def names(self) -> list[str]:
        return sorted(self._data)

    def create(self, name: str) -> None:
        self._data.setdefault(name, [])
        self._save()

    def delete(self, name: str) -> None:
        self._data.pop(name, None)
        self._save()

    def add(self, name: str, paths: list[str]) -> None:
        album = self._data.setdefault(name, [])
        for p in paths:
            if p not in album:
                album.append(p)
        self._save()

    def remove(self, name: str, paths: list[str]) -> None:
        album = self._data.get(name, [])
        self._data[name] = [p for p in album if p not in set(paths)]
        self._save()

    def images(self, name: str) -> list[str]:
        return list(self._data.get(name, []))
