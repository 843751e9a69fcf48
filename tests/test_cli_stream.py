"""CLI streaming surface: the `stream` subcommand drains the events feed
through host_fetch_rates + politeness_gate and prints two JSON lines."""

import json
import os

import pytest

from loong_spark import cli

SF = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


@pytest.mark.skipif(not os.path.isdir(SF), reason="testdata not present")
def test_cli_stream(capsys, spark):
    # reuse the session fixture's JVM: cli._spark goes through get_spark,
    # which getOrCreate()s onto it
    rc = cli.main([
        "stream", "--events", os.path.join(SF, "events.parquet"),
        "--gate-delay", "3600",
    ])
    assert rc == 0
    lines = [json.loads(line) for line in capsys.readouterr().out.splitlines()
             if line.startswith("{")]
    by = {d["stream"]: d for d in lines}
    rates, gate = by["host_fetch_rates"], by["politeness_gate"]
    assert rates["windows"] >= 1 and rates["host_rows"] >= rates["windows"]
    assert gate["events"] == gate["admitted"] + gate["suppressed"]
    # a 1-hour politeness delay must suppress repeat hosts aggressively
    assert gate["suppressed"] > 0


def test_cli_stream_rejects_bad_path(capsys, spark):
    rc = cli.main(["stream", "--events", "/nonexistent/nowhere"])
    assert rc == 2
