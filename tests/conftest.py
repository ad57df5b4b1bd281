from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nt_data_pipelines_spark.session import get_spark


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run tests marked slow (long fuzzes / e2e flows) — the "
        "full-fidelity profile; the default profile skips them for a "
        "fast inner loop (pytest-xdist is not available in this "
        "environment, so profile split is the only lever)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow: needs --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("nt-tests", cores=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def pytest_terminal_summary(terminalreporter):
    """Non-fatal regenerate notice: CORRECTNESS artifacts newer than
    the rotation snapshot are the expected state mid-round (the driver
    writes after the commit). A visible terminal line — never a test
    failure, and immune to `filterwarnings = error` hardening."""
    try:
        from nt_data_pipelines_spark.plans._driver_priority import ARTIFACT_SET
        from nt_data_pipelines_spark.plans.rotation import artifact_files

        repo = str(Path(__file__).resolve().parents[1])
        newer = sorted(set(artifact_files(repo)) - set(ARTIFACT_SET))
        if newer:
            terminalreporter.write_line(
                f"NOTE: CORRECTNESS artifacts newer than the rotation "
                f"snapshot: {newer} — run scripts/gen_driver_priority.py "
                "to refresh the driver fronting order",
                yellow=True,
            )
    except Exception:  # the notice must never break a test run
        pass
