"""Asynchronous crop export.

Host-side IO executor overlapping image encode/write with device inference —
the TPU-era analogue of the reference's ``pc.saver`` thread + bounded queue
(person_capture/gui_app.py:5155-5372): atomic writes (tmp + os.replace,
optional file+dir fsync, size verification) and an ``index.csv`` with the
reference's exact column schema.
"""

from __future__ import annotations

import csv
import os
import queue
import threading
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

CSV_COLUMNS = ["frame", "time_secs", "score", "face_dist", "reid_dist",
               "x1", "y1", "x2", "y2", "crop_path", "sharpness", "ratio"]


def atomic_image_write(img: np.ndarray, out_path: str, jpg_quality: int = 85,
                       fsync: bool = False) -> Tuple[bool, str]:
    """Encode + write via tmp file, rename into place, verify size."""
    if cv2 is None:
        return False, "cv2_unavailable"
    tmp = out_path + ".tmp"
    try:
        ext = os.path.splitext(out_path)[1].lower() or ".jpg"
        params: List[int] = []
        if ext in (".jpg", ".jpeg") and int(jpg_quality) > 0:
            params = [int(cv2.IMWRITE_JPEG_QUALITY), int(jpg_quality)]
        ok, buf = cv2.imencode(ext, img, params)
        if not ok or buf is None:
            return False, "imencode_failed"
        with open(tmp, "wb") as fh:
            fh.write(buf.tobytes())
            if fsync:
                fh.flush()
                os.fsync(fh.fileno())
        os.replace(tmp, out_path)
        if fsync:
            o_dir = getattr(os, "O_DIRECTORY", None)
            if o_dir is not None:
                dfd = os.open(os.path.dirname(out_path) or ".",
                              os.O_RDONLY | int(o_dir))
                try:
                    os.fsync(dfd)
                finally:
                    os.close(dfd)
        expected = int(getattr(buf, "nbytes", len(buf)))
        actual = int(os.path.getsize(out_path))
        if actual != expected:
            try:
                os.remove(out_path)
            except OSError:
                pass
            return False, f"file_size_mismatch:{actual}!={expected}"
        return True, ""
    except Exception as e:  # noqa: BLE001 — saver must never kill the run
        try:
            if os.path.exists(tmp):
                os.remove(tmp)
        except OSError:
            pass
        return False, f"{type(e).__name__}: {e}"


@dataclass
class SaveItem:
    img: Optional[np.ndarray]
    path: str
    csv_row: Optional[List] = None
    # Deferred render (e.g. HDR full-res export): called on the saver thread
    # as render(path) -> (ok, err); `img` may be None then. Mirrors the
    # reference's typed hdr_sdr queue items (gui_app.py:7276-7344).
    render: Optional[object] = None


class AsyncSaver:
    """Bounded-queue background writer with CSV accounting.

    With ``async_save=False`` everything runs inline (synchronous mode for
    debugging, like the reference).
    """

    def __init__(self, out_dir: str, jpg_quality: int = 85,
                 fsync: bool = False, async_save: bool = True,
                 queue_size: int = 512, csv_name: str = "index.csv"):
        self.out_dir = out_dir
        self.jpg_quality = int(jpg_quality)
        self.fsync = bool(fsync)
        self.async_save = bool(async_save)
        os.makedirs(out_dir, exist_ok=True)
        self.csv_path = os.path.join(out_dir, csv_name)
        self._csv_f = open(self.csv_path, "w", newline="")
        self._csv = csv.writer(self._csv_f)
        self._csv.writerow(CSV_COLUMNS)
        self._csv_lock = threading.Lock()
        self.saved: List[str] = []
        self.errors: List[Tuple[str, str]] = []
        self._q: Optional[queue.Queue] = None
        self._thread: Optional[threading.Thread] = None
        if self.async_save:
            self._q = queue.Queue(maxsize=queue_size)
            self._thread = threading.Thread(target=self._worker,
                                            name="pc.saver", daemon=True)
            self._thread.start()

    def submit(self, item: SaveItem) -> None:
        if self._q is not None:
            self._q.put(item)
        else:
            self._handle(item)

    def _worker(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                break
            try:
                self._handle(item)
            finally:
                self._q.task_done()

    def _handle(self, item: SaveItem) -> None:
        if item.render is not None:
            try:
                ok, err = item.render(item.path)
            except Exception as e:  # noqa: BLE001 — saver must never die
                ok, err = False, f"{type(e).__name__}: {e}"
        else:
            ok, err = atomic_image_write(item.img, item.path,
                                         self.jpg_quality, self.fsync)
        if ok:
            self.saved.append(item.path)
            if item.csv_row is not None:
                with self._csv_lock:
                    self._csv.writerow(item.csv_row)
        else:
            self.errors.append((item.path, err))

    def close(self) -> None:
        if self._q is not None:
            self._q.put(None)
            self._thread.join(timeout=60)
        with self._csv_lock:
            self._csv_f.flush()
            self._csv_f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
