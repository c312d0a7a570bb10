"""Community presets: manifest fetch, preview rendering, install.

Port of the reference's community-preset pipeline (lib.rs:1191-1330
`fetch_community_presets` / `generate_all_community_previews`,
file_management.rs:2703-2757 `save_community_preset`): a hosted
manifest.json lists presets {name, adjustments, creator?}; the app
renders a small preview collage per preset and installs chosen ones
under a "Community" folder of the preset store.

The network half is behind an injectable `fetcher` so the offline
pipeline (parse -> preview -> install) is fully usable and testable
without egress; the default fetcher uses urllib against the reference's
manifest URL and reports a clear error when the environment has none.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Callable, Iterable

import numpy as np

MANIFEST_URL = (
    "https://raw.githubusercontent.com/CyberTimon/RapidRAW-Presets/main/manifest.json"
)
PREVIEW_TILE_DIM = 360  # lib.rs:1226 TILE_DIM
COMMUNITY_FOLDER = "Community"


@dataclasses.dataclass
class CommunityPreset:
    name: str
    adjustments: dict
    creator: str | None = None

    @classmethod
    def from_json(cls, obj: dict) -> "CommunityPreset":
        if not isinstance(obj, dict) or "name" not in obj:
            raise ValueError("community preset entries need a 'name'")
        adj = obj.get("adjustments")
        if not isinstance(adj, dict):
            raise ValueError(f"preset {obj.get('name')!r} has no adjustments object")
        return cls(
            name=str(obj["name"]),
            adjustments=adj,
            creator=obj.get("creator") or obj.get("author"),
        )


def _default_fetcher(url: str) -> str:
    import urllib.request

    req = urllib.request.Request(url, headers={"User-Agent": "RapidRAW-App"})
    with urllib.request.urlopen(req, timeout=20) as resp:  # noqa: S310
        return resp.read().decode("utf-8")


def fetch_community_presets(
    fetcher: Callable[[str], str] | None = None,
    url: str = MANIFEST_URL,
) -> list[CommunityPreset]:
    """Fetch + parse the community manifest (lib.rs:1191-1213).

    `fetcher(url) -> text` is injectable; offline callers can hand a
    file-backed fetcher (or call parse_manifest directly).
    """
    fetcher = fetcher or _default_fetcher
    try:
        text = fetcher(url)
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            f"failed to fetch community manifest from {url}: {e} "
            "(no network egress? pass a fetcher or a local manifest)"
        ) from e
    return parse_manifest(text)


def parse_manifest(text: str) -> list[CommunityPreset]:
    data = json.loads(text)
    if not isinstance(data, list):
        raise ValueError("community manifest must be a JSON array")
    out = []
    for entry in data:
        try:
            out.append(CommunityPreset.from_json(entry))
        except ValueError:
            continue  # skip malformed entries, keep the rest usable
    return out


def generate_community_previews(
    image_paths: Iterable[str],
    presets: Iterable[CommunityPreset],
    tile_dim: int = PREVIEW_TILE_DIM,
) -> dict[str, bytes]:
    """Render a JPEG preview collage per preset (lib.rs:1216-1330).

    Each source image is downscaled to ~2x tile_dim, developed with the
    preset's adjustments (masks included; crop coordinates scaled to the
    preview resolution like the reference), cropped to a square tile and
    concatenated horizontally.
    """
    import jax.numpy as jnp

    from rapidraw_tpu.geometry.resize import downscale
    from rapidraw_tpu.geometry.transforms import apply_all_transformations
    from rapidraw_tpu.io.encode import encode_jpeg_bytes
    from rapidraw_tpu.io.loader import load_image, parse_virtual_path
    from rapidraw_tpu.masks.rasterize import rasterize_masks
    from rapidraw_tpu.params.parse import parse_adjustments

    processing_dim = tile_dim * 2
    bases: list[tuple[np.ndarray, bool, float]] = []
    for path in image_paths:
        real, _ = parse_virtual_path(str(path))
        img, is_raw = load_image(real)
        _, h, w = np.shape(img)
        if max(h, w) > processing_dim:
            s = processing_dim / max(h, w)
            img = np.asarray(
                downscale(jnp.asarray(img), max(1, round(w * s)), max(1, round(h * s)))
            )
            scale = s
        else:
            img = np.asarray(img)
            scale = 1.0
        bases.append((img, is_raw, scale))

    results: dict[str, bytes] = {}
    for preset in presets:
        tiles = []
        for base, is_raw, scale in bases:
            adj = dict(preset.adjustments)
            crop = adj.get("crop")
            if isinstance(crop, dict):
                adj["crop"] = {k: float(v) * scale for k, v in crop.items()}
            adj["showClipping"] = False
            timg, crop_offset = apply_all_transformations(
                jnp.asarray(base), adj, patch_scale=scale
            )
            _, th, tw = timg.shape
            masks = rasterize_masks(adj, tw, th, scale=scale, crop_offset=crop_offset)
            params, cfg = parse_adjustments(adj, is_raw=is_raw)
            lut = None
            if cfg.has_lut and isinstance(adj.get("lutPath"), str):
                from rapidraw_tpu.io.lut import parse_lut_file

                try:
                    lut = jnp.asarray(parse_lut_file(adj["lutPath"]))
                except Exception:
                    import dataclasses

                    cfg = dataclasses.replace(cfg, has_lut=False)
            # compiled batch-of-1 (the export/CLI entry): per-op eager
            # dispatch is the slow case on a remote device, and preset
            # tiles repeat the same cfg across source images so the jit
            # cache amortizes across the collage
            from rapidraw_tpu.pipeline.export import develop_single_compiled

            out = np.asarray(
                develop_single_compiled(timg, params, cfg, masks=masks, lut=lut)
            )
            # square center tile
            _, oh, ow = out.shape
            side = min(oh, ow, tile_dim)
            y0 = (oh - side) // 2
            x0 = (ow - side) // 2
            tiles.append(out[:, y0 : y0 + side, x0 : x0 + side])
        if not tiles:
            continue
        side = min(t.shape[1] for t in tiles)
        strip = np.concatenate([t[:, :side, :side] for t in tiles], axis=2)
        results[preset.name] = encode_jpeg_bytes(strip, quality=80)
    return results


def save_community_preset(
    store,
    name: str,
    adjustments: dict,
    include_masks: bool | None = None,
    include_crop_transform: bool | None = None,
    preset_type: str | None = None,
) -> dict:
    """Install one community preset under the 'Community' folder of a
    PresetStore, replacing any same-named entry there
    (file_management.rs:2703-2757)."""
    # add() already replaces any same (name, folder) entry; one final save
    # persists the extra fields (three rewrites per install otherwise)
    entry = store.add(name, adjustments, folder=COMMUNITY_FOLDER)
    entry["includeMasks"] = include_masks
    entry["includeCropTransform"] = include_crop_transform
    entry["presetType"] = preset_type or "style"
    store._save()
    return entry
