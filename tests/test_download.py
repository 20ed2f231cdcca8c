"""Dataset downloader: marker/resume semantics via a stub datalad binary."""

import os
import stat
from pathlib import Path

import pytest

from algonauts2025_tpu.data.download import Datalad

_STUB = """#!/bin/sh
echo "$@" >> "$DATALAD_STUB_LOG"
if [ "$1" = "clone" ]; then mkdir -p "$3"; fi
exit 0
"""


@pytest.fixture()
def stub_datalad(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    stub = bindir / "datalad"
    stub.write_text(_STUB)
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    log = tmp_path / "calls.log"
    monkeypatch.setenv("PATH", f"{bindir}{os.pathsep}{os.environ['PATH']}")
    monkeypatch.setenv("DATALAD_STUB_LOG", str(log))
    return log


def _calls(log: Path) -> list[str]:
    return log.read_text().splitlines() if log.exists() else []


def test_download_clone_and_get(tmp_path, stub_datalad):
    dl = Datalad(dset_dir=tmp_path / "ds", paths=["fmri", "stimuli/movies"], jobs=2)
    out = dl.download()
    assert out == tmp_path / "ds" / "download" / "algonauts_2025.competitors"
    calls = _calls(stub_datalad)
    assert calls[0].startswith("clone ")
    assert "get -J 2 fmri" in calls[1]
    assert "get -J 2 stimuli/movies" in calls[2]
    # success markers written per step
    markers = sorted(p.name for p in (tmp_path / "ds").glob(".download_*"))
    assert markers == [
        ".download_clone_success.txt",
        ".download_get_fmri_success.txt",
        ".download_get_stimuli_movies_success.txt",
    ]


def test_download_resumes_from_markers(tmp_path, stub_datalad):
    dl = Datalad(dset_dir=tmp_path / "ds", paths=["fmri"])
    dl.download()
    n_first = len(_calls(stub_datalad))
    dl.download()  # second call: everything marker-gated, no new commands
    assert len(_calls(stub_datalad)) == n_first

    # a new target triggers only its own fetch
    dl2 = Datalad(dset_dir=tmp_path / "ds", paths=["fmri", "stimuli"])
    dl2.download()
    calls = _calls(stub_datalad)
    assert len(calls) == n_first + 1
    assert calls[-1].endswith("stimuli")


def test_download_requires_datalad(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path))  # no datalad anywhere
    with pytest.raises(RuntimeError, match="datalad is not installed"):
        Datalad(dset_dir=tmp_path / "ds").download()
