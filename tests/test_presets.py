"""Preset catalog schema + menu API (SURVEY.md §4 unit plan)."""

import numpy as np
import pytest

from spatialsim_tpu.distributions import DISTRIBUTIONS
from spatialsim_tpu.presets import (
    CATEGORY_ORDER, PRESETS, get_preset_by_index, get_preset_config,
    get_preset_list, parse_number, print_preset_menu)
from spatialsim_tpu.tools.record import (config_from_preset,
                                         estimate_recording_time)

REQUIRED = {"name", "description", "category", "num_bodies", "theta", "G",
            "softening", "damping", "spawn_radius", "distribution",
            "total_frames", "dt_per_frame", "substeps", "target_fps",
            "estimated_time"}


def test_catalog_size_and_schema():
    assert len(PRESETS) == 66
    for key, p in PRESETS.items():
        missing = REQUIRED - set(p)
        assert not missing, f"{key} missing {missing}"
        assert p["category"] in CATEGORY_ORDER, key
        assert p["distribution"] in DISTRIBUTIONS, key
        assert p["num_bodies"] > 0 and p["total_frames"] > 0, key
        assert 0 < p["theta"] <= 2.0 and p["substeps"] >= 1, key


def test_catalog_spans_reference_scale():
    sizes = [p["num_bodies"] for p in PRESETS.values()]
    assert min(sizes) <= 20_000            # TINY tier
    assert max(sizes) == 50_000_000        # EXTREME tier (README.md:3)


def test_preset_list_ordered_by_category():
    cats = [p["category"] for _, p in get_preset_list()]
    ranks = [CATEGORY_ORDER.index(c) for c in cats]
    assert ranks == sorted(ranks)


def test_lookup_apis():
    key, p = get_preset_by_index(0)
    assert key in PRESETS
    assert get_preset_by_index(10_000) == (None, None)
    cfg = get_preset_config("bar_galaxy")
    assert cfg["session_name"] == "bar_galaxy"
    assert get_preset_config("nope") is None
    # get_preset_config returns a copy, not the catalog entry.
    cfg["num_bodies"] = 1
    assert PRESETS["bar_galaxy"]["num_bodies"] != 1


def test_parse_number_suffixes():
    assert parse_number("500k") == 500_000
    assert parse_number("1.5M") == 1_500_000
    assert parse_number("2,000") == 2000
    assert parse_number(" 42 ") == 42
    with pytest.raises(ValueError):
        parse_number("abc")


def test_menu_prints_every_preset(capsys):
    print_preset_menu()
    out = capsys.readouterr().out
    for p in PRESETS.values():
        assert p["name"] in out


def test_every_preset_maps_to_physics_config_and_estimate():
    for key in PRESETS:
        cfg = get_preset_config(key)
        sim_cfg = config_from_preset(cfg)
        assert sim_cfg.num_bodies == cfg["num_bodies"]
        assert sim_cfg.distribution == cfg["distribution"]
        est = estimate_recording_time(cfg)
        assert np.isfinite(est) and est >= 0
