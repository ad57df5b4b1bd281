"""Regenerate docs/QUERIES.md from the live plans registry."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nt_data_pipelines_spark.plans import REGISTRY


def main() -> None:
    rows = []
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        doc = " ".join((spec.doc or "").split())
        kind = "paired" if spec.oracle else "rows-only"
        rows.append(f"| `{name}` | {kind} | {doc} |")
    out = Path(__file__).resolve().parents[1] / "docs" / "QUERIES.md"
    out.write_text(
        "# Query registry reference\n\n"
        f"Auto-generated from `nt_data_pipelines_spark/plans` ({len(REGISTRY)} queries) "
        "by `scripts/gen_queries_doc.py`. Oracle = DuckDB differential check; "
        "rows-only entries are non-SQL-expressible (iterative).\n\n"
        "| Query | Oracle | What it covers |\n|---|---|---|\n" + "\n".join(rows) + "\n"
    )
    print(f"wrote {out} ({len(REGISTRY)} queries)")


if __name__ == "__main__":
    main()
