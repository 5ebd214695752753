"""Registry unification (plans/registry.py): the constituent name space,
the CLI query surface and docs/SUITE_MAP.md must agree — a renamed
constituent may not silently drop out of any of the three."""

from pathlib import Path

from melt_spark.plans.registry import all_named, constituents, entries

SUITE_MAP = (Path(__file__).resolve().parent.parent
             / "docs" / "SUITE_MAP.md")


def test_no_name_collisions_between_suites():
    reg = constituents()
    assert len(reg) >= 110


def test_every_constituent_documented_in_suite_map():
    """Renaming a constituent in the suites without updating SUITE_MAP
    (or vice versa) must fail loudly here."""
    text = SUITE_MAP.read_text()
    missing = [n for n in constituents() if n not in text]
    assert not missing, f"constituents absent from SUITE_MAP.md: {missing}"


def test_suite_map_surface_counts_match_registry():
    """The doc's claimed surface size is generated truth, not prose."""
    from melt_spark.plans.analytics_suite import ANALYTICS_SUITE
    from melt_spark.plans.pipeline_suite import PIPELINE_SUITE

    text = SUITE_MAP.read_text()
    claim = (f"ANALYTICS_SUITE ({len(ANALYTICS_SUITE)}) + "
             f"PIPELINE_SUITE ({len(PIPELINE_SUITE)})")
    assert claim in text, (
        f"SUITE_MAP.md surface-size line is stale: expected {claim!r}; "
        "update the header when adding constituents")


def test_driver_entry_window_is_exactly_50():
    assert len(entries()) == 50


def test_all_named_prefers_merged_entries():
    """Where an entry shadows a constituent name, the merged (driver-
    checked) plan must win in the CLI surface."""
    reg = all_named()
    shadowed = set(constituents()) & set(entries())
    assert "clean_corpus" in shadowed
    for name in shadowed:
        assert reg[name] is entries()[name]


def test_check_one_and_cli_share_the_registry():
    """Source-level guard: neither consumer rebuilds its own union."""
    root = Path(__file__).resolve().parent.parent
    cli = (root / "melt_spark" / "cli.py").read_text()
    one = (root / "tools" / "check_one.py").read_text()
    assert "from .plans.registry import all_named" in cli
    assert "from melt_spark.plans.registry import constituents" in one
    assert "ANALYTICS_SUITE, **PIPELINE_SUITE" not in cli
    assert "ANALYTICS_SUITE, **PIPELINE_SUITE" not in one
