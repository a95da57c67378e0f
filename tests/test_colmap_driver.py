"""COLMAP driver: correct stage sequence and arguments, via a fake binary."""

import stat
import sys
from pathlib import Path

import pytest

from nerfjax.colmap.driver import find_colmap, run_colmap


@pytest.fixture()
def fake_colmap(tmp_path, monkeypatch):
    """A stand-in 'colmap' executable that logs its argv and creates the
    outputs the next stage expects."""
    log = tmp_path / "calls.log"
    script = tmp_path / "colmap"
    script.write_text(
        "#!/bin/sh\n"
        f'echo "$@" >> "{log}"\n'
        "exit 0\n"
    )
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}:{Path('/usr/bin')}", prepend=None)
    return log


def test_find_colmap_missing(monkeypatch, tmp_path):
    monkeypatch.setenv("PATH", str(tmp_path))
    with pytest.raises(FileNotFoundError):
        find_colmap()


def test_run_colmap_stage_sequence(tmp_path, fake_colmap):
    ws = tmp_path / "scene"
    (ws / "images").mkdir(parents=True)
    out = run_colmap(ws, gpu=False, verbose=False)
    assert out == ws / "colmap_text"
    assert out.exists()

    calls = fake_colmap.read_text().strip().splitlines()
    stages = [c.split()[0] for c in calls]
    assert stages == [
        "feature_extractor",
        "exhaustive_matcher",
        "mapper",
        "bundle_adjuster",
        "model_converter",
    ]
    # contract details the converters rely on
    assert "--output_type TXT" in calls[-1]
    assert f"--image_path {ws/'images'}" in calls[0]
    assert "--SiftExtraction.use_gpu 0" in calls[0]


def test_run_colmap_sequential_matcher(tmp_path, fake_colmap):
    ws = tmp_path / "scene2"
    (ws / "images").mkdir(parents=True)
    run_colmap(ws, matcher="sequential", verbose=False)
    calls = fake_colmap.read_text()
    assert "sequential_matcher" in calls


def test_run_colmap_fails_loudly(tmp_path, monkeypatch):
    script = tmp_path / "colmap"
    script.write_text("#!/bin/sh\nexit 3\n")
    script.chmod(0o755)
    monkeypatch.setenv("PATH", str(tmp_path))
    ws = tmp_path / "scene3"
    (ws / "images").mkdir(parents=True)
    with pytest.raises(SystemExit):
        run_colmap(ws, verbose=False)
