"""Append-only memmap array store with a JSONL index.

TPU-native replacement for exca's MemmapArrayFile/NumpyMemmapArray caches
(reference features cache activations per item uid, e.g. text.py:204-208,
audio.py:140-144).  One store = one flat binary file plus a JSONL index of
(key, offset, shape, dtype).  Reads are zero-copy memmap views, so the
feature __call__ hot path (DataLoader equivalent) never deserializes.

Writes are guarded by an exclusive lock file so concurrent prepare() calls
from several processes don't interleave (the reference relied on exca's
file locks for the same purpose).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
import typing as tp
from pathlib import Path

import numpy as np

__all__ = ["ArrayStore"]


def _lock_owner_dead(lock: Path) -> bool:
    """True when the lock names a process on THIS host that no longer runs.

    Lock files carry "host:pid".  Cross-host owners are never declared
    dead (no liveness signal over NFS); unreadable/empty lock files are
    treated as live (conservative: a writer may be mid-create)."""
    try:
        host, _, pid_s = lock.read_text().strip().partition(":")
        pid = int(pid_s)
    except (OSError, ValueError):
        return False
    if host != os.uname().nodename:
        return False
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return True
    except PermissionError:
        return False  # alive, different user
    return False


@contextlib.contextmanager
def _file_lock(path: Path, timeout: float = 600.0) -> tp.Iterator[None]:
    lock = Path(str(path) + ".lock")
    owner = f"{os.uname().nodename}:{os.getpid()}"
    start = time.time()
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            try:
                os.write(fd, owner.encode())
            finally:
                os.close(fd)
            break
        except FileExistsError:
            # a SIGKILLed writer leaves its lock behind forever; steal it
            # when its pid is provably gone.  The steal is an atomic
            # rename (only one stealer wins) gated on a content re-check,
            # so a racing fresh acquire isn't unlinked by mistake.
            if _lock_owner_dead(lock):
                stale = Path(f"{lock}.stale-{os.getpid()}")
                with contextlib.suppress(OSError):
                    if _lock_owner_dead(lock):  # re-check just before steal
                        os.rename(lock, stale)
                        os.unlink(stale)
                continue
            if time.time() - start > timeout:
                held_by = "?"
                with contextlib.suppress(OSError):
                    held_by = lock.read_text().strip()
                raise TimeoutError(
                    f"Could not acquire lock {lock} (held by {held_by}); "
                    "if that process is gone on another host, delete the "
                    "lock file manually"
                )
            time.sleep(0.05)
    try:
        yield
    finally:
        with contextlib.suppress(FileNotFoundError):
            os.unlink(lock)


class ArrayStore:
    """Dict-like {str key -> np.ndarray} backed by a single memmap file."""

    def __init__(self, folder: str | Path, keep_in_ram: bool = False) -> None:
        self.folder = Path(folder)
        self.folder.mkdir(parents=True, exist_ok=True)
        self._bin = self.folder / "data.bin"
        self._index_path = self.folder / "index.jsonl"
        self._index: dict[str, tuple[int, tuple[int, ...], str]] = {}
        self._index_mtime: tuple[int, int] | float = -1.0
        self._ram: dict[str, np.ndarray] | None = {} if keep_in_ram else None
        self._mmap: np.memmap | None = None
        self._load_index()

    def _load_index(self) -> None:
        if not self._index_path.exists():
            return
        st = self._index_path.stat()
        # (mtime_ns, size): size grows on every append, so two writes in
        # one coarse-granularity mtime tick (NFS) can't serve a stale index
        mtime = (st.st_mtime_ns, st.st_size)
        if mtime == self._index_mtime and self._index:
            return
        index: dict[str, tuple[int, tuple[int, ...], str]] = {}
        with open(self._index_path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue  # torn write from a crashed producer
                index[rec["k"]] = (rec["o"], tuple(rec["s"]), rec["d"])
        self._index = index
        self._index_mtime = mtime
        self._mmap = None  # file may have grown

    def refresh(self) -> None:
        self._load_index()

    def __len__(self) -> int:
        return len(self._index)

    def keys(self) -> tp.KeysView[str]:
        return self._index.keys()

    def __contains__(self, key: str) -> bool:
        if key in self._index:
            return True
        self._load_index()
        return key in self._index

    def __getitem__(self, key: str) -> np.ndarray:
        if self._ram is not None and key in self._ram:
            return self._ram[key]
        if key not in self._index:
            self._load_index()
        offset, shape, dtype = self._index[key]
        if self._mmap is None:
            self._mmap = np.memmap(self._bin, dtype=np.uint8, mode="r")
        nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
        arr = self._mmap[offset : offset + nbytes].view(dtype).reshape(shape)
        if self._ram is not None:
            arr = np.array(arr)  # own the data in RAM
            self._ram[key] = arr
        return arr

    def missing(self, keys: tp.Iterable[str]) -> list[str]:
        self._load_index()
        return [k for k in keys if k not in self._index]

    def append_many(self, items: tp.Iterable[tuple[str, np.ndarray]]) -> None:
        """Append arrays; flushes index entry after each payload write."""
        with _file_lock(self._bin):
            self._load_index()
            with open(self._bin, "ab") as bf, open(self._index_path, "a") as xf:
                for key, arr in items:
                    if key in self._index:
                        continue
                    arr = np.ascontiguousarray(arr)
                    offset = bf.tell()
                    bf.write(arr.tobytes())
                    bf.flush()
                    rec = {
                        "k": key,
                        "o": offset,
                        "s": list(arr.shape),
                        "d": arr.dtype.str,
                    }
                    xf.write(json.dumps(rec) + "\n")
                    xf.flush()
                    self._index[key] = (offset, arr.shape, arr.dtype.str)
                    if self._ram is not None:
                        self._ram[key] = np.array(arr)
        self._mmap = None

    def clear(self) -> None:
        with _file_lock(self._bin):
            for p in (self._bin, self._index_path):
                with contextlib.suppress(FileNotFoundError):
                    os.unlink(p)
            self._index = {}
            self._index_mtime = -1.0
            self._mmap = None
            if self._ram is not None:
                self._ram = {}
