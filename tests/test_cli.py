"""CLI surface: build-docs -> query / repl / serve round-trip.

Runs the CLI as subprocesses against a tiny committed index (built once
by the session Ray fixture — the subprocess query paths need no Ray)."""

from __future__ import annotations

import json
import subprocess
import sys
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def cli_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.build import (
        build_index_from_docs,
    )

    idx = str(tmp_path_factory.mktemp("cli") / "idx")
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    build_index_from_docs(docs, idx, input_lineage={"t": "cli"})
    return idx


def _run(args: list[str], stdin: str | None = None) -> str:
    p = subprocess.run(
        [sys.executable, "-m", "semantic_pdf_search_engine_ray.cli", *args],
        capture_output=True, text=True, cwd=REPO, input=stdin, timeout=120,
    )
    assert p.returncode == 0, p.stderr
    return p.stdout


def test_cli_query_topk(cli_index):
    out = _run(["query", "--index", cli_index, "--query", "table scan",
                "-k", "3"])
    rows = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    assert len(rows) == 3
    assert rows[0]["rank"] == 1
    assert rows[0]["score"] >= rows[1]["score"] >= rows[2]["score"]


def test_cli_query_conjunctive_subset(cli_index):
    dis = _run(["query", "--index", cli_index, "--query", "table scan",
                "-k", "100", "--method", "exhaustive"])
    con = _run(["query", "--index", cli_index, "--query", "table scan",
                "-k", "100", "--method", "conjunctive"])
    dis_ids = {json.loads(l)["doc_id"] for l in dis.splitlines()}
    con_ids = {json.loads(l)["doc_id"] for l in con.splitlines()}
    assert con_ids <= dis_ids


def test_cli_repl_loop(cli_index):
    out = _run(["repl", "--index", cli_index, "-k", "2"],
               stdin="search table scan\nquit\n")
    rows = [json.loads(l) for l in out.splitlines() if l.startswith('{"rank"')]
    assert len(rows) == 2


def test_cli_zero_hit_query(cli_index):
    out = _run(["query", "--index", cli_index, "--query",
                "zzzznotaword", "-k", "5"])
    assert not [l for l in out.splitlines() if l.startswith("{")]
