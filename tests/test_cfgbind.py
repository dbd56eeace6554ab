"""Config↔control binding helpers (utils/cfgbind.py) powering the
auto-generated GUI settings tab."""

import dataclasses

from person_capture_tpu.config import LIVE_KEYS, SessionConfig
from person_capture_tpu.utils.cfgbind import (coerce_field_value,
                                              group_for_field,
                                              grouped_fields, widget_kind)


def test_every_config_field_is_grouped():
    names = {f.name for f in dataclasses.fields(SessionConfig)}
    bound = {n for fields in grouped_fields().values() for n, _ in fields}
    missing = names - bound - {"video", "ref", "out_dir"}
    assert not missing, f"fields without a control: {sorted(missing)}"


def test_live_keys_all_bound():
    bound = {n for fields in grouped_fields().values() for n, _ in fields}
    assert set(LIVE_KEYS) <= bound


def test_coerce_round_trip():
    assert coerce_field_value(True, "false") is False
    assert coerce_field_value(False, 1) is True
    assert coerce_field_value(3, "7") == 7
    assert coerce_field_value(0.5, "0.25") == 0.25
    assert coerce_field_value((0.6, 0.3, 0.1), "0.2, 0.3, 0.5") == (0.2, 0.3, 0.5)
    assert coerce_field_value((1, 2), "(3, 4)") == (3, 4)
    assert coerce_field_value("auto", "zscale") == "zscale"


def test_widget_kinds():
    assert widget_kind(True) == "check"
    assert widget_kind(3) == "int"
    assert widget_kind(0.5) == "float"
    assert widget_kind((1.0, 2.0)) == "tuple"
    assert widget_kind("x") == "text"


def test_grouping_prefixes():
    assert group_for_field("prescan_stride") == "Pre-scan"
    assert group_for_field("hdr_sdr_tonemap") == "HDR"
    assert group_for_field("curate_lambda") == "Curation"
    assert group_for_field("lock_momentum") == "Lock / faceless"
