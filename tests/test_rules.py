"""Unit tests for the canonical rules tables (SURVEY.md §4.2 "Unit")."""

import numpy as np
import pytest

from blockpuzzle_tpu import rules
from blockpuzzle_tpu.config import (
    EnvConfig,
    big_config,
    default_config,
    tenten_config,
    woodoku_config,
)


def test_classic19_piece_set():
    grids = rules.piece_grids("classic19")
    assert len(grids) == 19
    cells = [int(g.sum()) for g in grids]
    # 1x1, bars 2..5 twice, 2x2, 3x3, 4 small-L (3 cells), 4 big-L (5 cells)
    assert cells == [1, 2, 3, 4, 5, 2, 3, 4, 5, 4, 9, 3, 3, 3, 3, 5, 5, 5, 5]


def test_tables_cover_row_sums():
    cfg = default_config()
    t = rules.tables_for(cfg)
    row_sums = t.cover.sum(axis=1)
    for p in range(t.num_pieces):
        seg = slice(p * cfg.num_cells, (p + 1) * cfg.num_cells)
        expected = np.where(t.valid[seg], t.piece_cells[p], 0)
        np.testing.assert_array_equal(row_sums[seg], expected)


def test_valid_anchor_counts():
    cfg = default_config()
    t = rules.tables_for(cfg)
    for p in range(t.num_pieces):
        seg = t.valid[p * cfg.num_cells : (p + 1) * cfg.num_cells]
        nh = cfg.height - int(t.piece_h[p]) + 1
        nw = cfg.width - int(t.piece_w[p]) + 1
        assert seg.sum() == nh * nw


def test_decode_encode_roundtrip():
    cfg = tenten_config()
    for a in [0, 1, 99, 100, 299, cfg.num_actions() - 1]:
        s, r, c = rules.decode_action(cfg, a)
        assert rules.encode_action(cfg, s, r, c) == a
        assert 0 <= s < cfg.queue_size


def test_line_bonus_schedule():
    cfg = default_config()
    assert rules.line_bonus(cfg, 0) == 0.0
    assert rules.line_bonus(cfg, 1) == 10.0
    assert rules.line_bonus(cfg, 2) == 30.0
    assert rules.line_bonus(cfg, 3) == 60.0


def test_region_masks_woodoku():
    cfg = woodoku_config()
    t = rules.tables_for(cfg)
    assert t.region_masks.shape == (9, 81)
    np.testing.assert_array_equal(t.region_masks.sum(axis=1), np.full(9, 9))
    # regions tile the board exactly once
    np.testing.assert_array_equal(t.region_masks.sum(axis=0), np.ones(81))


def test_apply_env_overrides():
    from blockpuzzle_tpu.config import apply_env_overrides, default_config

    cfg = apply_env_overrides(
        default_config(),
        ["streak_bonus=5", "queue_size=3", "refill_batch=true",
         "piece_set=mini5"],
    )
    assert cfg.streak_bonus == 5.0 and cfg.queue_size == 3
    assert cfg.refill_batch is True and cfg.piece_set == "mini5"
    # no-op on empty, identity preserved
    base = default_config()
    assert apply_env_overrides(base, []) == base
    import pytest as _pytest

    with _pytest.raises(ValueError):
        apply_env_overrides(base, ["bogus_knob=1"])
    with _pytest.raises(ValueError):
        apply_env_overrides(base, ["streak_bonus"])  # missing '='
    with _pytest.raises(ValueError):
        apply_env_overrides(base, ["refill_batch=maybe"])
    with _pytest.raises(ValueError):
        # coerced values still hit EnvConfig validation
        apply_env_overrides(base, ["height=0"])


def test_config_validation():
    with pytest.raises(ValueError):
        EnvConfig(height=0)
    with pytest.raises(ValueError):
        EnvConfig(region_clear=True, height=10, width=10)  # 10 % 3 != 0
    big_config()  # constructs fine


def test_table_cache_identity():
    cfg = default_config()
    assert rules.tables_for(cfg) is rules.tables_for(EnvConfig())


def test_non_minimal_piece_bbox_rejected(monkeypatch):
    """A grid with an empty border row/col must fail table build loudly.

    The shift mask impl derives legality from occupied taps + ones-padding
    only, so a non-minimal bbox would silently make it more permissive
    than the valid-anchor table (code-review r2 finding).
    """
    bad = np.array([[1, 1, 0], [1, 0, 0], [0, 0, 0]], dtype=np.uint8)
    monkeypatch.setattr(rules, "piece_grids", lambda name: [bad])
    with pytest.raises(ValueError, match="non-minimal"):
        rules.build_tables(default_config())
