"""Regenerate the registered-query index block in the four ledger docs.

Registration discipline (VERDICT r9 item 3): every registered query name
must be grep-able in ALL FOUR ledger docs — SURVEY.md §8, PLANS.md,
SCALING.md, README.md. The narrative sections of those docs cover names
selectively (highlights, family rows, decade laws); this script maintains a
complete auto-generated index between HTML marker comments at the end of
each doc so coverage can never drift again. `tests/test_registry_meta.py::
test_four_ledger_docs_contain_every_registered_name` enforces it.

Idempotent: replaces the marked block in place (appends it on first run).

Usage: python scripts/sync_docs_index.py
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_vector_database_spark import queries as q  # noqa: E402
from distributed_vector_database_spark import docs_anchors as da  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- BEGIN REGISTERED-QUERY INDEX (auto-generated: scripts/sync_docs_index.py) -->"
END = "<!-- END REGISTERED-QUERY INDEX -->"

# Per-doc framing: the index points back at where the doc's real evidence
# for each name lives, so the block is an index, not a narrative clone.
FRAMING = {
    "README.md": (
        "## Appendix — registered query index\n\n"
        "Every operator ships as a named registry row in `queries.py` with "
        "a paired DuckDB oracle (see Correctness). The module tree above "
        "highlights families; this is the complete name list ({n} rows):\n"
    ),
    "SURVEY.md": (
        "### 8.1 Complete registered-name index\n\n"
        "The coverage map above traces reference behavior to families; "
        "this is the full per-name registry ({n} rows), each paired with "
        "oracle SQL in `queries.py` and driver-checked on the rotation "
        "schedule (ROADMAP.md):\n"
    ),
    "PLANS.md": (
        "## Appendix — registered query index\n\n"
        "Plan audits above cover each family's representative physical "
        "plan; every name below ({n} rows) executes one of those audited "
        "shapes. Mapped names show their plan-sketch family (`name` → "
        "`family`, hand-assigned in "
        "`distributed_vector_database_spark/docs_anchors.py`); bare names "
        "are self-anchored (their own sketch heading is above):\n"
    ),
    "SCALING.md": (
        "## Appendix — registered query index\n\n"
        "Decade-law rows above are measured per family representative; "
        "every name below ({n} rows) runs one of those measured shapes. "
        "Mapped names show their decade-law family (`name` → `family`, "
        "hand-assigned in "
        "`distributed_vector_database_spark/docs_anchors.py`); bare names "
        "are self-anchored (their own decade row is above). Bench medians "
        "per name: BENCH_FULL.json:\n"
    ),
}

# docs with a per-name anchor cross-reference (the substance assignment
# tests/test_registry_meta.py enforces); README/SURVEY stay a plain list
ANCHORS = {
    "SCALING.md": da.SCALING_ANCHOR,
    "PLANS.md": da.PLANS_ANCHOR,
}


def _index_lines(names: list[str], anchors: dict[str, str] | None) -> str:
    # Compact grep-able form: a few names per line keeps the block short
    # while every name stays a literal backticked token in the doc.
    per_line = 3 if anchors else 4
    out = []
    row: list[str] = []
    for n in sorted(names):
        tok = f"`{n}`"
        if anchors and n in anchors:
            tok += f" → `{anchors[n]}`"
        row.append(tok)
        if len(row) == per_line:
            out.append("- " + " · ".join(row))
            row = []
    if row:
        out.append("- " + " · ".join(row))
    return "\n".join(out) + "\n"


def main() -> None:
    names = list(q.registry())
    for doc, frame in FRAMING.items():
        body = _index_lines(names, ANCHORS.get(doc))
        path = os.path.join(REPO, doc)
        text = open(path).read()
        block = (
            f"{BEGIN}\n{frame.format(n=len(names))}\n{body}{END}\n"
        )
        pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END) + r"\n?", re.S)
        if pat.search(text):
            text = pat.sub(block, text)
        else:
            if not text.endswith("\n"):
                text += "\n"
            text += "\n" + block
        open(path, "w").write(text)
        # backticked token form (ADVICE r10): substring containment would
        # pass vacuously for names nested in longer present names
        missing = [n for n in names if f"`{n}`" not in text]
        assert not missing, f"{doc} still missing {missing[:5]}"
        print(f"{doc}: index block synced ({len(names)} names)")


if __name__ == "__main__":
    main()
