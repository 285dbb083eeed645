"""The one-command acceptance runner (scripts/validate_acceptance.py)
must dry-run green today so it closes the BASELINE.md gates the day the
trained-weight bundle becomes fetchable (VERDICT r4 #4)."""

import importlib.util
import json
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_runner():
    spec = importlib.util.spec_from_file_location(
        "validate_acceptance", os.path.join(ROOT, "scripts", "validate_acceptance.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dry_run_passes_and_reports(monkeypatch, tmp_path):
    mod = _load_runner()
    out = tmp_path / "acceptance.json"
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "validate_acceptance.py",
            "--dry-run",
            "--frames",
            "2",
            "--out",
            str(out),
        ],
    )
    assert mod.main() == 0
    report = json.loads(out.read_text())
    assert report["dry_run"] is True
    gates = report["gates"]
    assert set(gates) == {"converter_roundtrip", "detector_iou", "pitch_rmse", "results_schema"}
    for name, gate in gates.items():
        assert gate["status"] == "PASS", (name, gate)
    # the weight-independent gates are ENFORCED even in dry-run
    assert gates["detector_iou"]["mean_iou"] >= 0.99
    assert gates["pitch_rmse"]["max_rmse_m"] <= 1e-2


def test_missing_weights_dir_implies_dry_run(monkeypatch, tmp_path):
    mod = _load_runner()
    out = tmp_path / "acceptance.json"
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "validate_acceptance.py",
            "--weights-dir",
            str(tmp_path / "nonexistent"),
            "--frames",
            "2",
            "--out",
            str(out),
        ],
    )
    assert mod.main() == 0
    assert json.loads(out.read_text())["dry_run"] is True
