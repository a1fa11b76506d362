"""scratch_dir() election contract (VERDICT r16 #7 / ADVICE r16):
the tmpfs default must be gated on free space (Docker's default
/dev/shm is 64 MB — electing it converts spill into ENOSPC/RAM
pressure), and an explicitly set SPARK_GRAFT_LOCAL_DIR must be
created rather than silently ignored."""

from __future__ import annotations

import os

import pytest

from pyspark_data_processing_challenge_spark import session as sess


def test_small_shm_falls_back_to_stock(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR", raising=False)

    class _Small:
        f_bavail = 1024
        f_frsize = 4096  # 4 MiB free — way under the floor

    monkeypatch.setattr(os, "statvfs", lambda path: _Small())
    assert sess.scratch_dir() is None


def test_roomy_shm_elected(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR", raising=False)
    if not os.path.isdir("/dev/shm") or not os.access("/dev/shm", os.W_OK):
        pytest.skip("no writable /dev/shm on this host")

    class _Roomy:
        f_bavail = 2**25
        f_frsize = 4096  # 128 GiB free

    monkeypatch.setattr(os, "statvfs", lambda path: _Roomy())
    assert sess.scratch_dir() == "/dev/shm/spark-graft-local"


def test_statvfs_failure_is_conservative(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR", raising=False)

    def _boom(path):
        raise OSError("statvfs unavailable")

    monkeypatch.setattr(os, "statvfs", _boom)
    assert sess.scratch_dir() is None


def test_explicit_dir_is_created(monkeypatch, tmp_path):
    target = tmp_path / "nested" / "scratch"
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", str(target))
    assert sess.scratch_dir() == str(target)
    assert target.is_dir()


def test_explicit_uncreatable_dir_raises(monkeypatch, tmp_path):
    blocker = tmp_path / "file"
    blocker.write_text("not a dir")
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", str(blocker / "sub"))
    with pytest.raises(OSError):
        sess.scratch_dir()
