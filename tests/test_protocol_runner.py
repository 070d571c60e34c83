"""The one-command protocol runner (tools/run_protocol.py): the synthetic
dry-run drives every stage — zero-shot, few-shot train, base->new transfer
reload, domain-gen eval, aggregation — and reruns resume by skipping
completed units (VERDICT r3 item 7)."""

import pytest

pytestmark = pytest.mark.slow  # measured multi-minute module (round-4 durations)

import json
import os

from tools.run_protocol import main


def test_synthetic_dryrun_end_to_end(tmp_path, capsys):
    root = str(tmp_path / "proto")
    assert main(["--synthetic", "--output_root", root]) == 0

    summary = json.load(open(os.path.join(root, "protocol_summary.json")))
    assert summary["n_units"] == 6
    assert set(summary["zeroshot"]) == {"synthetic"}
    assert summary["fewshot"]["synthetic"]["n_seeds"] == 1
    b2n = summary["base2new"]["synthetic"]
    assert set(b2n) == {"base", "new", "H"}
    assert "source:synthetic" in summary["domain_gen"]
    assert summary["failures"] == []
    first_out = capsys.readouterr().out
    assert first_out.count("[run ]") == 6

    # resumability: a rerun of the same command skips every unit
    assert main(["--synthetic", "--output_root", root]) == 0
    out = capsys.readouterr().out
    assert out.count("[skip]") == 6 and "[run ]" not in out


def test_published_comparison_gates_exit(tmp_path):
    root = str(tmp_path / "proto")
    assert main(["--synthetic", "--output_root", root]) == 0
    # a published table far from the synthetic numbers must fail the gate
    pub = tmp_path / "published.json"
    pub.write_text(json.dumps({"fewshot": {"synthetic": 95.0}}))
    rc = main(
        ["--synthetic", "--output_root", root, "--published", str(pub),
         "--stages", "parse"]
    )
    assert rc == 1
    summary = json.load(open(os.path.join(root, "protocol_summary.json")))
    assert summary["failures"] == ["fewshot/synthetic"]
    assert "published_comparison" in summary
