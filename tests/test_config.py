import json

from person_capture_tpu.config import LIVE_KEYS, SessionConfig


def test_roundtrip_json():
    c = SessionConfig()
    c.face_thresh = 0.33
    c.prescan_stride = 12
    s = c.to_json()
    c2 = SessionConfig.from_json(s)
    assert c2.face_thresh == 0.33
    assert c2.prescan_stride == 12
    assert c2.prescan_weights == (0.70, 0.25, 0.05)


def test_paths_stripped_by_default():
    c = SessionConfig(video="/v.mp4", ref="/r.jpg", out_dir="/o")
    d = json.loads(c.to_json())
    assert "video" not in d and "ref" not in d and "out_dir" not in d
    d2 = json.loads(c.to_json(include_paths=True))
    assert d2["video"] == "/v.mp4"


def test_from_json_ignores_paths_and_unknown_keys():
    s = json.dumps({"video": "/x.mp4", "face_thresh": 0.5, "bogus_key": 1})
    c = SessionConfig.from_json(s)
    assert c.video == ""
    assert c.face_thresh == 0.5
    assert not hasattr(c, "bogus_key")


def test_reference_presets_load():
    """The reference's shipped preset JSON files must load unchanged."""
    import pathlib

    ref = pathlib.Path("/root/reference")
    if not ref.exists():
        return
    for name in ("solidpreset.json", "preset_face_strict.json",
                 "preset_face_balanced.json"):
        p = ref / name
        if not p.exists():
            continue
        c = SessionConfig.from_json(p.read_text())
        assert isinstance(c.prescan_stride, int)
        assert isinstance(c.prescan_weights, tuple)


def test_tuple_coercion():
    c = SessionConfig.from_json(json.dumps({"prescan_weights": [0.5, 0.3, 0.2]}))
    assert c.prescan_weights == (0.5, 0.3, 0.2)


def test_live_keys_are_valid_fields():
    c = SessionConfig()
    for k in LIVE_KEYS:
        assert hasattr(c, k), k
