"""General file + parallel-map utilities — the mp_tools/vlmeval/utils layer
(SURVEY.md C22: files.py load/dump/locking, mp_util.py track_progress_rich,
misc.py helpers) rebuilt without the VLMEvalKit baggage.

Everything is extension-dispatched like the reference ``load``/``dump``
(files.py:142-206); xlsx support is gated on an engine being importable
(openpyxl is not in this image — xlsx writes fall back to csv next to the
requested path with a warning, reads raise).
"""

from __future__ import annotations

import csv
import hashlib
import json
import logging
import os
import pickle
import time

logger = logging.getLogger(__name__)


def md5(path_or_bytes) -> str:
    """md5 of a file path or bytes (reference files.py:22-29)."""
    h = hashlib.md5()
    if isinstance(path_or_bytes, bytes):
        h.update(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
    return h.hexdigest()


def file_size(path: str, unit: str = "GB") -> float:
    """files.py:114-121."""
    size = os.path.getsize(path)
    return size / {"B": 1, "KB": 1 << 10, "MB": 1 << 20,
                   "GB": 1 << 30, "TB": 1 << 40}[unit]


def lmu_data_root() -> str:
    """$LMUData (reference files.py:104-112): the TSV benchmark-data dir."""
    root = os.environ.get("LMUData",
                          os.path.join(os.path.expanduser("~"), "LMUData"))
    os.makedirs(root, exist_ok=True)
    return root


# ---------------------------------------------------------------------------
# load / dump by extension
# ---------------------------------------------------------------------------

def _rows_to_table(data):
    """list-of-dicts (or dict-of-lists) -> (header, rows) for csv/tsv."""
    if isinstance(data, dict):
        keys = list(data)
        n = len(next(iter(data.values()))) if data else 0
        rows = [[data[k][i] for k in keys] for i in range(n)]
        return keys, rows
    keys = list(data[0]) if data else []
    return keys, [[r.get(k, "") for k in keys] for r in data]


def dump(data, path: str, **kw):
    """Extension-dispatched save: .pkl .json .jsonl .csv .tsv .xlsx
    (reference files.py:142-164)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".pkl":
        with open(path, "wb") as f:
            pickle.dump(data, f)
    elif ext == ".json":
        with open(path, "w") as f:
            json.dump(data, f, indent=kw.get("indent", 4),
                      ensure_ascii=False, default=str)
    elif ext == ".jsonl":
        with open(path, "w") as f:
            for row in data:
                f.write(json.dumps(row, ensure_ascii=False, default=str) + "\n")
    elif ext in (".csv", ".tsv"):
        delim = "\t" if ext == ".tsv" else ","
        header, rows = _rows_to_table(data)
        with open(path, "w", newline="") as f:
            w = csv.writer(f, delimiter=delim, quoting=csv.QUOTE_ALL)
            w.writerow(header)
            w.writerows(rows)
    elif ext == ".xlsx":
        try:
            import pandas as pd
            pd.DataFrame(data).to_excel(path, index=False)
        except Exception as e:  # no engine in this image
            alt = path[:-5] + ".csv"
            logger.warning("xlsx engine unavailable (%s); writing %s", e, alt)
            dump(data, alt)
    else:
        raise ValueError(f"unsupported extension: {path}")


def load(path: str):
    """Extension-dispatched load (reference files.py:179-206)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".pkl":
        with open(path, "rb") as f:
            return pickle.load(f)
    if ext == ".json":
        with open(path) as f:
            return json.load(f)
    if ext == ".jsonl":
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]
    if ext in (".csv", ".tsv"):
        delim = "\t" if ext == ".tsv" else ","
        with open(path, newline="") as f:
            rows = list(csv.reader(f, delimiter=delim))
        header = rows[0]
        return [dict(zip(header, r)) for r in rows[1:]]
    if ext == ".xlsx":
        import pandas as pd
        return pd.read_excel(path).to_dict("records")
    raise ValueError(f"unsupported extension: {path}")


def dump_json_withlock(data, path: str, timeout: float = 5, **kw):
    """Locked json write (reference files.py:167-177, portalocker): safe for
    concurrent per-rank writers appending to a shared results file.

    Kernel-arbitrated ``flock`` on a persistent sidecar, like the
    reference's portalocker: the lock dies with the holder (a SIGKILLed
    writer cannot deadlock future writers), and there is no stale-age
    breaking protocol — an earlier mtime-based breaker had a
    check-then-unlink race that could delete a freshly acquired lock and
    let two writers interleave on the shared file.
    """
    import fcntl

    lock_path = path + ".lock"
    deadline = time.time() + timeout
    fd = os.open(lock_path, os.O_CREAT | os.O_WRONLY)
    try:
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError:
                if time.time() > deadline:
                    raise TimeoutError(
                        f"lock {lock_path} held past {timeout}s")
                time.sleep(0.05)
        dump(data, path, **kw)
    finally:
        os.close(fd)   # releases the flock; the sidecar file persists


def download_file(url: str, filename: str | None = None) -> str:
    """urllib download with progress (reference files.py:208-229).  NOTE:
    zero-egress environments will fail here by design — callers should
    treat the artifact as a local prerequisite."""
    import urllib.request

    filename = filename or url.split("/")[-1]
    try:
        from tqdm import tqdm

        class _Bar(tqdm):
            def update_to(self, b=1, bsize=1, tsize=None):
                if tsize is not None:
                    self.total = tsize
                self.update(b * bsize - self.n)

        with _Bar(unit="B", unit_scale=True, miniters=1,
                  desc=filename) as bar:
            urllib.request.urlretrieve(url, filename,
                                       reporthook=bar.update_to)
    except ImportError:
        urllib.request.urlretrieve(url, filename)
    return filename


# ---------------------------------------------------------------------------
# parallel map with progress + incremental save (mp_util.track_progress_rich)
# ---------------------------------------------------------------------------

def track_progress(func, tasks, nproc: int = 1, description: str = "Processing",
                   save: str | None = None, keys: list | None = None,
                   chunksize: int = 1) -> list:
    """Ordered parallel map with a progress bar and optional incremental
    save — the reference ``track_progress_rich`` (mp_util.py:53-140) with
    threads instead of fork (host work here is IO/ffmpeg-bound and jax
    handles are not fork-safe).

    ``save``: a .json/.pkl path updated as {key: result} after every task
    (resume artifact); ``keys`` must then parallel ``tasks``.
    """
    from concurrent.futures import ThreadPoolExecutor

    tasks = list(tasks)
    if save and keys is not None and len(keys) != len(tasks):
        raise ValueError("keys must parallel tasks")
    results: list = [None] * len(tasks)
    saved = load(save) if save and os.path.exists(save) else {}
    # json round-trips keys as strings: normalize so a resumed run updates
    # the same entries instead of adding int-keyed duplicates of "0", "1", …
    json_save = bool(save) and save.lower().endswith(".json")

    def save_key(i):
        k = keys[i] if keys else i
        return str(k) if json_save else k

    def call(i):
        t = tasks[i]
        if isinstance(t, dict):
            return i, func(**t)
        if isinstance(t, (tuple, list)):
            return i, func(*t)
        return i, func(t)

    try:
        from rich.progress import Progress
        progress_cm = Progress()
    except ImportError:
        progress_cm = None

    def run_all(update):
        if nproc <= 1:
            for i in range(len(tasks)):
                _, res = call(i)
                results[i] = res
                if save:
                    saved[save_key(i)] = res
                    dump(saved, save)
                update()
        else:
            with ThreadPoolExecutor(max_workers=nproc) as pool:
                for i, res in pool.map(call, range(len(tasks)),
                                       chunksize=chunksize):
                    results[i] = res
                    if save:
                        saved[save_key(i)] = res
                        dump(saved, save)
                    update()

    if progress_cm is not None:
        with progress_cm as progress:
            tid = progress.add_task(description, total=len(tasks))
            run_all(lambda: progress.advance(tid))
    else:
        run_all(lambda: None)
    return results
