"""Shared Spark session for the suite (one JVM, module-scope reuse)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from processo_etl_spark import session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spk = session.get_spark(app_name="tests", cpus=4, shuffle_partitions=4)
    yield spk
