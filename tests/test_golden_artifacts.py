"""Pinned-golden artifacts must cover every scale factor the harness
can point at (review r12): the goldens' oracle SQL filters on a
per-sf discriminator, so a dir missing from the artifact silently
yields ZERO oracle rows — the driver would report an engine-vs-empty
mismatch misattributed to the engine. These tests fail FIRST, with a
regenerate message, whenever /root/testdata grows an sf dir the
goldens don't know."""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))


def test_testdata_dirs_exist():
    assert SF_DIRS, "no /root/testdata/sf* dirs — harness layout changed"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_bpe_golden_covers_sf(sf_dir):
    golden = os.path.join(REPO, "tests", "golden", "bpe_tokenize.parquet")
    con = duckdb.connect()
    disc = con.sql(
        f"SELECT SUM(LEN(text)) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    hit = con.sql(
        f"SELECT COUNT(*) FROM read_parquet('{golden}') WHERE src_chars = {disc}"
    ).fetchone()[0]
    assert hit > 0, (
        f"bpe_tokenize golden has no rows for {sf_dir} "
        f"(SUM(LEN(text)) = {disc}) — run scripts/make_bpe_golden.py "
        "with the new dir in SF_DIRS"
    )
    # the discriminator must select exactly this sf's docs, no bleed
    n_docs = con.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    assert hit == n_docs, f"golden rows {hit} != documents rows {n_docs}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_w6_golden_covers_sf(sf_dir):
    golden = os.path.join(REPO, "tests", "golden", "w6_k5.parquet")
    con = duckdb.connect()
    disc = con.sql(f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet'").fetchone()[0]
    hit = con.sql(
        f"SELECT COUNT(*) FROM read_parquet('{golden}') WHERE src_rows = {disc}"
    ).fetchone()[0]
    assert hit > 0, (
        f"w6_k5 golden has no rows for {sf_dir} (events rows = {disc}) "
        "— run scripts/make_w6_golden.py with the new dir in SF_DIRS"
    )


def test_w6_discriminator_unambiguous():
    """src_rows (events COUNT) must be distinct across sf dirs — the
    reason the BPE golden uses SUM(LEN(text)) is that documents row
    counts collide at sf0.001/sf0.01; events counts must not."""
    con = duckdb.connect()
    counts = [
        con.sql(f"SELECT COUNT(*) FROM '{d}/events.parquet'").fetchone()[0]
        for d in SF_DIRS
    ]
    assert len(set(counts)) == len(counts), counts


def test_bpe_discriminator_unambiguous():
    con = duckdb.connect()
    sums = [
        con.sql(f"SELECT SUM(LEN(text)) FROM '{d}/documents.parquet'").fetchone()[0]
        for d in SF_DIRS
    ]
    assert len(set(sums)) == len(sums), sums
