"""Driver-contract invariants on the query registry: these are the
properties CORRECTNESS_r{N} generation depends on, pinned so a refactor
cannot silently break the driver's sweep."""

from __future__ import annotations

from squonk2_fastapi_ws_event_stream_spark.registry import (
    NON_SQL_QUERIES,
    ORACLES,
    QUERIES,
    _PRIORITY,
)


def test_every_query_has_an_oracle():
    assert set(QUERIES) == set(ORACLES)
    assert not NON_SQL_QUERIES


def test_no_duplicate_names_and_all_callable():
    assert len(QUERIES) == len(set(QUERIES))
    for fn in QUERIES.values():
        assert callable(fn)


def test_priority_names_resolve_and_lead_the_ordering():
    names = list(QUERIES)
    assert set(_PRIORITY) <= set(names)
    assert names[: len(_PRIORITY)] == list(_PRIORITY)


def test_entry_module_exports_match_registry():
    import __spark_entry__ as e

    assert set(e.queries()) == set(QUERIES)
    assert set(e.oracle_sql()) == set(ORACLES)


def test_cli_list_names_every_query(capsys):
    from squonk2_fastapi_ws_event_stream_spark.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert set(out) == set(QUERIES)


def test_cli_rejects_unknown_query():
    from squonk2_fastapi_ws_event_stream_spark.__main__ import main

    assert main(["run", "nonesuch", "--sf-dir", "/tmp"]) == 2


def test_changed_head_fits_the_driver_sampling_window():
    """The driver samples ~50 rows/round in _PRIORITY order; every
    output- or plan-changed query must get a fresh driver row THIS
    round, so the hand-maintained head must leave room for it plus at
    least two stalest-rotation slots. A head over the bound means a
    changed query ships without a driver row at its new definition —
    defer the change (the t09/t15/v30 pattern) instead of overflowing."""
    from squonk2_fastapi_ws_event_stream_spark.registry import _NEW_OR_CHANGED

    assert len(set(_NEW_OR_CHANGED)) == len(_NEW_OR_CHANGED)  # no dupes
    assert len(_NEW_OR_CHANGED) <= 48, (
        f"head has {len(_NEW_OR_CHANGED)} entries; the driver window is "
        "~50 — split the change across rounds"
    )
