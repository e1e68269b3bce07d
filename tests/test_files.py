"""utils/files.py: extension-dispatched load/dump, locking, parallel map."""

import json
import os
import threading

import pytest

from tspo_tpu.utils.files import (dump, dump_json_withlock, file_size, load,
                                  lmu_data_root, md5, track_progress)

ROWS = [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]


def test_round_trips(tmp_path):
    for ext in (".pkl", ".json", ".jsonl"):
        p = str(tmp_path / f"f{ext}")
        dump(ROWS, p)
        assert load(p) == ROWS
    for ext in (".csv", ".tsv"):
        p = str(tmp_path / f"f{ext}")
        dump(ROWS, p)
        back = load(p)
        assert [r["b"] for r in back] == ["x", "y"]  # csv stringifies values
    with pytest.raises(ValueError):
        dump(ROWS, str(tmp_path / "f.nope"))


def test_xlsx_fallback_or_roundtrip(tmp_path):
    p = str(tmp_path / "f.xlsx")
    dump(ROWS, p)
    # either a real xlsx (engine present) or the documented csv fallback
    assert os.path.exists(p) or os.path.exists(str(tmp_path / "f.csv"))


def test_md5_and_size(tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"123456789")
    assert md5(str(p)) == md5(b"123456789") == "25f9e794323b453885f5181f1b624d0b"
    assert file_size(str(p), "B") == 9


def test_lmu_data_root(tmp_path, monkeypatch):
    monkeypatch.setenv("LMUData", str(tmp_path / "lmu"))
    assert lmu_data_root() == str(tmp_path / "lmu")
    assert os.path.isdir(str(tmp_path / "lmu"))


def test_dump_json_withlock(tmp_path):
    p = str(tmp_path / "out.json")
    errs = []

    def writer(i):
        try:
            dump_json_withlock({"writer": i}, p, timeout=10)
        except Exception as e:
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert "writer" in json.load(open(p))


def test_dump_json_withlock_survives_killed_holder(tmp_path):
    """A leftover .lock sidecar from a dead writer must not block anyone:
    flock dies with its holder, so acquisition succeeds immediately (the
    old mtime-stale protocol is gone along with its unlink race)."""
    p = str(tmp_path / "out.json")
    open(p + ".lock", "w").close()          # orphaned sidecar, no holder
    dump_json_withlock({"ok": 1}, p, timeout=1)
    assert json.load(open(p)) == {"ok": 1}


def test_dump_json_withlock_times_out_against_live_holder(tmp_path):
    import fcntl
    p = str(tmp_path / "out.json")
    fd = os.open(p + ".lock", os.O_CREAT | os.O_WRONLY)
    fcntl.flock(fd, fcntl.LOCK_EX)
    try:
        with pytest.raises(TimeoutError):
            dump_json_withlock({"ok": 1}, p, timeout=0.3)
    finally:
        os.close(fd)


def test_track_progress_ordered_and_saved(tmp_path):
    save = str(tmp_path / "partial.json")
    out = track_progress(lambda x: x * x, [3, 1, 4, 1, 5], nproc=3,
                         save=save, keys=["a", "b", "c", "d", "e"])
    assert out == [9, 1, 16, 1, 25]
    assert load(save) == {"a": 9, "b": 1, "c": 16, "d": 1, "e": 25}
    # tuple/dict task forms
    assert track_progress(lambda x, y: x + y, [(1, 2), (3, 4)]) == [3, 7]
    assert track_progress(lambda x, y: x - y, [{"x": 5, "y": 2}]) == [3]
