"""Registry bookkeeping invariants (VERDICT r2 item 8): at 180+ registered
queries the rotation ledger must not silently drift. Pure-Python checks —
no Spark session — so the whole file runs in milliseconds.

Invariants:
  1. every registered query has oracle SQL OR is on the documented
     rows-only list (non-SQL-expressible by design — the driver records a
     weaker rows-only check for those, and the judge sees which);
  2. the driver's 50-slot window (`queries._CHECK_FIRST`) is exactly the
     first 50 registrations after rotation;
  3. every registered query is accounted for: driver-verified in a
     CORRECTNESS_r*.json, in the current window, or listed in ROADMAP.md's
     ```next-window``` block for the next round — nothing unlisted;
  4. names in the window / next-window ledger actually exist in the
     registry (no stale ledger rows).
"""

import json
import pathlib
import re

from distributed_vector_database_spark import queries as q

REPO = pathlib.Path(__file__).resolve().parent.parent

# Queries whose semantics are not expressible as a single DuckDB statement
# (streaming state machines, persisted-index lifecycles); each has a pytest
# invariant instead. Adding a name here is a deliberate, reviewed act.
ROWS_ONLY_OK: set[str] = set()


def _correctness_names() -> set[str]:
    names: set[str] = set()
    for f in REPO.glob("CORRECTNESS_r*.json"):
        names |= set(json.load(open(f)))
    return names


def _next_window() -> list[str]:
    text = (REPO / "ROADMAP.md").read_text()
    m = re.search(r"```next-window\n(.*?)```", text, re.S)
    assert m, "ROADMAP.md must carry a ```next-window``` block"
    return [ln.strip() for ln in m.group(1).splitlines() if ln.strip()]


def test_every_query_has_oracle_or_is_documented_rows_only():
    missing = [
        name
        for name, (_fn, sql) in q.registry().items()
        if sql is None and name not in ROWS_ONLY_OK
    ]
    assert not missing, (
        f"queries without oracle SQL and not on ROWS_ONLY_OK: {missing}"
    )


def test_check_first_is_the_front_of_the_registry():
    front = list(q.registry())[: len(q._CHECK_FIRST)]
    assert front == q._CHECK_FIRST
    assert len(q._CHECK_FIRST) == 50, (
        f"driver window is 50 slots, _CHECK_FIRST has {len(q._CHECK_FIRST)}"
    )
    assert len(set(q._CHECK_FIRST)) == 50


def test_rotation_ledger_accounts_for_every_query():
    verified = _correctness_names()
    window = set(q._CHECK_FIRST)
    nxt = _next_window()
    unaccounted = [
        n
        for n in q.registry()
        if n not in verified and n not in window and n not in nxt
    ]
    assert not unaccounted, (
        "never-driver-verified queries missing from both _CHECK_FIRST and "
        f"ROADMAP.md's next-window block: {unaccounted}"
    )


def test_ledger_names_exist_in_registry():
    reg = set(q.registry())
    stale_window = [n for n in q._CHECK_FIRST if n not in reg]
    stale_next = [n for n in _next_window() if n not in reg]
    assert not stale_window and not stale_next, (
        f"stale ledger rows — window: {stale_window}, next: {stale_next}"
    )


def test_next_window_fits_driver_slot_budget():
    assert len(_next_window()) <= 50, (
        "next-window exceeds the 50-slot driver window; split it"
    )


def test_no_oracle_emits_top_level_list_or_struct_column():
    """The round driver's canonicalizer sorts raw pandas cells: a top-level
    LIST/STRUCT/MAP result column crashes it with `TypeError: unhashable
    type` even when the repo's own harness (which stringifies cells) is
    green — this made `dq_quarantined_events` driver-red in r3/r4. Bind
    every registered oracle against the sf0.001 views and assert every
    result column is scalar; nested data must be array_to_string'd /
    struct-unpacked on BOTH sides before registration."""
    import duckdb

    sf = pathlib.Path("/root/testdata/sf0.001")
    if not sf.exists():
        import pytest

        pytest.skip("driver testdata not present")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf / (t + '.parquet')}'"
        )
    bad: dict[str, list[str]] = {}
    for name, (_fn, sql) in q.registry().items():
        if sql is None:
            continue
        rel = con.sql(sql)
        nested = [
            f"{c}: {t}"
            for c, t in zip(rel.columns, rel.types)
            if "[]" in str(t)
            or str(t).startswith(("STRUCT", "MAP", "LIST", "UNION"))
        ]
        if nested:
            bad[name] = nested
    assert not bad, (
        "oracles returning top-level nested columns (driver canonicalizer "
        f"cannot sort these — flatten on both sides): {bad}"
    )


_INDEX_BEGIN = (
    "<!-- BEGIN REGISTERED-QUERY INDEX "
    "(auto-generated: scripts/sync_docs_index.py) -->"
)
_INDEX_END = "<!-- END REGISTERED-QUERY INDEX -->"


def _without_index_block(text: str) -> str:
    import re

    return re.sub(
        re.escape(_INDEX_BEGIN) + r".*?" + re.escape(_INDEX_END),
        "",
        text,
        flags=re.S,
    )


def test_four_ledger_docs_contain_every_registered_name():
    """Registration discipline, all four ledger docs (VERDICT r9 item 3):
    every registered name must be grep-able in SURVEY.md, PLANS.md,
    SCALING.md AND README.md. Narrative sections cover names selectively;
    the auto-generated index block (scripts/sync_docs_index.py) guarantees
    completeness — run that script after registering a query.

    Matches the BACKTICKED token form the index emits (ADVICE r10): plain
    substring containment let a name that is a substring of another
    present name (`topk_cosine` inside `batch_topk_cosine`) pass
    vacuously even when dropped from the index block."""
    names = list(q.registry())
    stale: dict[str, list[str]] = {}
    for doc in ("README.md", "SURVEY.md", "PLANS.md", "SCALING.md"):
        text = (REPO / doc).read_text()
        missing = [n for n in names if f"`{n}`" not in text]
        if missing:
            stale[doc] = missing
    assert not stale, (
        "ledger docs missing registered names — run "
        f"scripts/sync_docs_index.py: {stale}"
    )


def test_every_registered_name_has_substantive_doc_anchor():
    """VERDICT r10 item 4 (the auto-index masking hole): name presence
    inside the auto-generated index block does NOT satisfy SCALING.md /
    PLANS.md. Every registered name must resolve — via the hand-
    maintained `docs_anchors` assignment — to a decade-law / plan-sketch
    family representative whose name appears in the doc's NARRATIVE
    (outside the index block). A new registration therefore fails until
    its author either writes the decade row + plan sketch (self-anchor)
    or consciously assigns an existing measured family in
    `distributed_vector_database_spark/docs_anchors.py`."""
    from distributed_vector_database_spark import docs_anchors as da

    names = set(q.registry())

    # the maps must not accumulate entries for unregistered names
    dangling = sorted(
        k
        for k in set(da.SCALING_ANCHOR) | set(da.PLANS_ANCHOR)
        if k not in names
    )
    assert not dangling, f"docs_anchors maps unregistered names: {dangling}"

    # anchors must be terminal (self-anchored representatives), never
    # chains — a chain would let a family's substance be deleted while
    # the test stays green through an intermediate hop
    chain_sc = sorted(
        n for n, a in da.SCALING_ANCHOR.items() if a in da.SCALING_ANCHOR
    )
    chain_pl = sorted(
        n for n, a in da.PLANS_ANCHOR.items() if a in da.PLANS_ANCHOR
    )
    assert not chain_sc, f"SCALING anchor chains: {chain_sc}"
    assert not chain_pl, f"PLANS anchor chains: {chain_pl}"

    for doc, resolve in (
        ("SCALING.md", da.scaling_anchor),
        ("PLANS.md", da.plans_anchor),
    ):
        narrative = _without_index_block((REPO / doc).read_text())
        missing = {
            n: resolve(n) for n in sorted(names) if resolve(n) not in narrative
        }
        assert not missing, (
            f"{doc}: registered names whose anchor has no substantive "
            f"narrative entry (decade row / plan sketch) — write the "
            f"substance or assign a measured family in docs_anchors.py: "
            f"{missing}"
        )
