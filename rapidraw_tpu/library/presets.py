"""Adjustment presets.

Port of the reference preset store (file_management.rs:2521-2757): named
adjustment documents (optionally organized in folders), stored as JSON;
`apply_preset` merges a preset's adjustments over an image's current ones
respecting the copy/paste-style section granularity. Community presets are
the same format imported from arbitrary JSON files.
"""

from __future__ import annotations

import json
import uuid
from pathlib import Path

# top-level adjustment keys per section (mirrors the frontend's Sections map)
SECTION_KEYS = {
    "basic": (
        "exposure", "brightness", "contrast", "highlights", "shadows",
        "whites", "blacks",
    ),
    "color": (
        "saturation", "temperature", "tint", "vibrance", "hue", "hsl",
        "colorGrading", "colorCalibration",
    ),
    "curves": ("curves", "pointCurves", "parametricCurve", "curveMode"),
    "details": (
        "sharpness", "sharpnessThreshold", "lumaNoiseReduction",
        "colorNoiseReduction", "clarity", "dehaze", "structure", "centré",
        "chromaticAberrationRedCyan", "chromaticAberrationBlueYellow",
    ),
    "effects": (
        "vignetteAmount", "vignetteMidpoint", "vignetteRoundness",
        "vignetteFeather", "grainAmount", "grainSize", "grainRoughness",
        "glowAmount", "halationAmount", "flareAmount", "lutPath",
        "lutIntensity", "toneMapper",
    ),
}


class PresetStore:
    """JSON-file preset store: [{id, name, folder, adjustments}]."""

    def __init__(self, store_path: str | Path):
        self.store_path = Path(store_path)
        self._presets: list[dict] = []
        if self.store_path.exists():
            try:
                data = json.loads(self.store_path.read_text())
                if isinstance(data, list):
                    self._presets = data
            except (OSError, json.JSONDecodeError):
                pass

    def _save(self) -> None:
        self.store_path.parent.mkdir(parents=True, exist_ok=True)
        self.store_path.write_text(json.dumps(self._presets, indent=2, ensure_ascii=False))

    def list(self) -> list[dict]:
        return list(self._presets)

    def get(self, name: str) -> dict | None:
        for p in self._presets:
            if p.get("name") == name:
                return p
        return None

    def add(self, name: str, adjustments: dict, folder: str | None = None) -> dict:
        preset = {
            "id": str(uuid.uuid4()),
            "name": name,
            "folder": folder,
            "adjustments": adjustments,
        }
        self._presets = [p for p in self._presets if p.get("name") != name]
        self._presets.append(preset)
        self._save()
        return preset

    def delete(self, name: str) -> bool:
        before = len(self._presets)
        self._presets = [p for p in self._presets if p.get("name") != name]
        self._save()
        return len(self._presets) != before

    def import_file(self, path: str | Path) -> list[dict]:
        """Community/legacy preset import (file_management.rs:2643-2757):
        accepts a single preset object, a list, or a Lightroom .xmp preset
        (converted via library.preset_converter)."""
        if str(path).lower().endswith(".xmp"):
            from rapidraw_tpu.library.preset_converter import convert_xmp_to_preset

            p = convert_xmp_to_preset(Path(path).read_text())
            return [self.add(p["name"], p["adjustments"])]
        data = json.loads(Path(path).read_text())
        items = data if isinstance(data, list) else [data]
        imported = []
        for item in items:
            if not isinstance(item, dict):
                continue
            adjustments = item.get("adjustments")
            name = item.get("name") or Path(path).stem
            if isinstance(adjustments, dict):
                imported.append(self.add(name, adjustments, item.get("folder")))
        return imported


def apply_preset(
    current: dict, preset_adjustments: dict, sections: list[str] | None = None
) -> dict:
    """Merge preset adjustments over current ones.

    sections: restrict to these sections (copy/paste granularity,
    app_settings.rs CopyPasteSettings); None = all preset keys.
    """
    out = dict(current)
    if sections is None:
        out.update(preset_adjustments)
        return out
    allowed = set()
    for s in sections:
        allowed.update(SECTION_KEYS.get(s, ()))
    for k, v in preset_adjustments.items():
        if k in allowed:
            out[k] = v
    return out
