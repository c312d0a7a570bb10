"""Community presets: manifest parse, offline preview render, install
(lib.rs:1191-1330 + file_management.rs:2703-2757) with an injectable
fetcher — the offline halves are fully exercised; the network fetch is
covered by the error contract."""

from __future__ import annotations

import json

import numpy as np
import pytest
from PIL import Image

from rapidraw_tpu.library.community import (
    CommunityPreset,
    fetch_community_presets,
    generate_community_previews,
    parse_manifest,
    save_community_preset,
)
from rapidraw_tpu.library.presets import PresetStore

MANIFEST = [
    {"name": "Teal Pop", "creator": "ann",
     "adjustments": {"exposure": 0.4, "saturation": 20, "toneMapper": "agx"}},
    {"name": "Mono", "adjustments": {"saturation": -100, "contrast": 25}},
    {"name": "broken-no-adjustments"},
]


def test_parse_manifest_skips_malformed():
    presets = parse_manifest(json.dumps(MANIFEST))
    assert [p.name for p in presets] == ["Teal Pop", "Mono"]
    assert presets[0].creator == "ann"
    assert presets[1].adjustments["contrast"] == 25


def test_fetch_with_injected_fetcher():
    presets = fetch_community_presets(fetcher=lambda url: json.dumps(MANIFEST))
    assert len(presets) == 2


def test_fetch_error_is_actionable():
    def boom(url):
        raise OSError("no egress")

    with pytest.raises(RuntimeError) as ei:
        fetch_community_presets(fetcher=boom)
    assert "manifest" in str(ei.value)


def test_previews_render_offline(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(2):
        p = tmp_path / f"img{i}.jpg"
        Image.fromarray((rng.random((80, 120, 3)) * 255).astype(np.uint8)).save(p)
        paths.append(str(p))
    presets = parse_manifest(json.dumps(MANIFEST))
    previews = generate_community_previews(paths, presets, tile_dim=64)
    assert set(previews) == {"Teal Pop", "Mono"}
    for name, jpeg in previews.items():
        assert jpeg[:2] == b"\xff\xd8"
        im = Image.open(__import__("io").BytesIO(jpeg))
        # two square tiles side by side
        assert im.size[0] == 2 * im.size[1]
    # the two presets must actually differ
    assert previews["Teal Pop"] != previews["Mono"]


def test_install_into_community_folder(tmp_path):
    store = PresetStore(tmp_path / "presets.json")
    presets = parse_manifest(json.dumps(MANIFEST))
    e1 = save_community_preset(store, presets[0].name, presets[0].adjustments)
    assert e1["folder"] == "Community"
    assert e1["presetType"] == "style"
    # replace same-named entry
    save_community_preset(store, "Teal Pop", {"exposure": 1.0})
    entries = [p for p in store.list() if p.get("folder") == "Community"]
    assert len(entries) == 1
    assert entries[0]["adjustments"] == {"exposure": 1.0}
    # persisted to disk
    store2 = PresetStore(tmp_path / "presets.json")
    assert store2.get("Teal Pop")["adjustments"] == {"exposure": 1.0}


def test_install_does_not_clobber_same_named_user_preset(tmp_path):
    from rapidraw_tpu.library.presets import PresetStore

    store = PresetStore(tmp_path / "presets.json")
    mine = store.add("Portrait", {"exposure": 0.5}, folder=None)
    save_community_preset(store, "Portrait", {"exposure": -1.0})
    names = [(p["name"], p.get("folder")) for p in store.list()]
    assert ("Portrait", None) in names, "user preset must survive install"
    assert ("Portrait", "Community") in names
    assert store.get("Portrait")["id"] == mine["id"]  # user's wins by order
    # reinstall replaces only the community copy
    save_community_preset(store, "Portrait", {"exposure": 2.0})
    comm = [p for p in store.list() if p.get("folder") == "Community"]
    assert len(comm) == 1 and comm[0]["adjustments"]["exposure"] == 2.0
    assert ("Portrait", None) in [(p["name"], p.get("folder")) for p in store.list()]
