"""Video decode/encode via the native libav codec library (ctypes).

Replaces the reference's decord readers (`bands/common/io.py:63-67`) and PyAV
VideoWriter (`io.py:246-305`) with a C++ shared library (native/codec/codec.cc).
Semantics match the reference writer: libx264, yuv420p, crf=15 default, long edge
capped at 3840, even dimensions.

The Python classes add what the TPU pipeline needs and the reference lacks:
- VideoReader.batches(): a background decode thread feeding a bounded queue, so
  host decode overlaps device compute (double-buffered H2D).
- VideoWriter: an optional background encode thread draining a frame queue, so
  x264 runs concurrently with the next device step (D2H overlap).
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "lib", "libprisma_codec.so")

_lib = None
_lib_lock = threading.Lock()


def _load_lib():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", os.path.join(_REPO_ROOT, "native")],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.pvc_open_reader.restype = ctypes.c_void_p
        lib.pvc_open_reader.argtypes = [ctypes.c_char_p]
        lib.pvc_reader_info.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
                                        ctypes.POINTER(ctypes.c_int),
                                        ctypes.POINTER(ctypes.c_double),
                                        ctypes.POINTER(ctypes.c_int64)]
        lib.pvc_read_frame.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.pvc_close_reader.argtypes = [ctypes.c_void_p]
        lib.pvc_open_writer.restype = ctypes.c_void_p
        lib.pvc_open_writer.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                        ctypes.c_double, ctypes.c_int, ctypes.c_char_p]
        lib.pvc_write_frame.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.pvc_writer_dims.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
                                        ctypes.POINTER(ctypes.c_int)]
        lib.pvc_close_writer.argtypes = [ctypes.c_void_p]
        lib.pvc_last_error.restype = ctypes.c_char_p
        _lib = lib
        return lib


def _last_error() -> str:
    return _load_lib().pvc_last_error().decode()


_FMT_CODES = {"gray": 0, "rgb24": 1, "rgba": 2, "rgb48le": 3, "gray16le": 4}


class VideoReader:
    """Sequential RGB24 frame reader with optional background prefetch."""

    def __init__(self, path: str):
        self._lib = _load_lib()
        self._h = self._lib.pvc_open_reader(path.encode())
        if not self._h:
            raise IOError(f"cannot open video {path}: {_last_error()}")
        w = ctypes.c_int()
        h = ctypes.c_int()
        fps = ctypes.c_double()
        n = ctypes.c_int64()
        self._lib.pvc_reader_info(self._h, ctypes.byref(w), ctypes.byref(h),
                                  ctypes.byref(fps), ctypes.byref(n))
        self.width, self.height = w.value, h.value
        self.fps = fps.value
        self.num_frames = int(n.value)

    def read(self) -> np.ndarray | None:
        """Next frame as uint8 RGB [H, W, 3], or None at EOF."""
        buf = np.empty((self.height, self.width, 3), dtype=np.uint8)
        rc = self._lib.pvc_read_frame(self._h, buf.ctypes.data_as(ctypes.c_void_p))
        if rc == 1:
            return buf
        if rc == 0:
            return None
        raise IOError(f"decode error: {_last_error()}")

    def __iter__(self):
        while (frame := self.read()) is not None:
            yield frame

    def batches(self, batch_size: int, pad_to_full: bool = False, prefetch: int = 2):
        """Yield (frames [B, H, W, 3] uint8, valid_count) with background decode.

        The final batch is short unless pad_to_full, in which case it is padded by
        repeating the last frame (so jitted shapes stay static) and valid_count
        tells the caller how many outputs to keep.
        """
        q: queue.Queue = queue.Queue(maxsize=prefetch)

        def produce():
            try:
                batch = []
                for frame in self:
                    batch.append(frame)
                    if len(batch) == batch_size:
                        q.put((np.stack(batch), batch_size))
                        batch = []
                if batch:
                    valid = len(batch)
                    if pad_to_full:
                        batch.extend([batch[-1]] * (batch_size - valid))
                    q.put((np.stack(batch), valid))
                q.put(None)
            except Exception as e:  # surface decoder errors to the consumer
                q.put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            yield item
        t.join()

    def close(self):
        if self._h:
            self._lib.pvc_close_reader(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def get_video_data(path: str):
    """(width, height, fps, total_frames) — reference io.py:63-67 contract."""
    r = VideoReader(path)
    try:
        return r.width, r.height, r.fps, r.num_frames
    finally:
        r.close()


class VideoWriter:
    """x264 mp4 writer matching the reference VideoWriter's output settings.

    With async_encode=True, frames are queued and encoded on a background thread.
    """

    def __init__(self, width: int, height: int, frame_rate: float, crf: int = 15,
                 filename: str = "output.mp4", codec: str = "libx264",
                 async_encode: bool = True, queue_depth: int = 8):
        self._lib = _load_lib()
        self._h = self._lib.pvc_open_writer(filename.encode(), width, height,
                                            float(frame_rate), crf, codec.encode())
        if not self._h:
            raise IOError(f"cannot open writer {filename}: {_last_error()}")
        w = ctypes.c_int()
        h = ctypes.c_int()
        self._lib.pvc_writer_dims(self._h, ctypes.byref(w), ctypes.byref(h))
        self.width, self.height = w.value, h.value
        self._err: Exception | None = None
        self._q: queue.Queue | None = None
        if async_encode:
            self._q = queue.Queue(maxsize=queue_depth)
            self._thread = threading.Thread(target=self._drain, daemon=True)
            self._thread.start()

    @staticmethod
    def _detect_format(frame: np.ndarray) -> str:
        if frame.ndim == 2 or frame.shape[2] == 1:
            return "gray16le" if frame.dtype == np.uint16 else "gray"
        if frame.shape[2] == 3:
            return "rgb48le" if frame.dtype == np.uint16 else "rgb24"
        if frame.shape[2] == 4:
            return "rgba"
        raise ValueError(f"unsupported frame shape {frame.shape}")

    def _encode(self, frame: np.ndarray, fmt: str | None):
        if fmt is None:
            fmt = self._detect_format(frame)
        if frame.dtype not in (np.uint8, np.uint16):
            frame = frame.astype(np.uint8)
        frame = np.ascontiguousarray(frame)
        rc = self._lib.pvc_write_frame(self._h, frame.ctypes.data_as(ctypes.c_void_p),
                                       frame.shape[1], frame.shape[0], _FMT_CODES[fmt])
        if rc != 0:
            raise IOError(f"encode error: {_last_error()}")

    def _drain(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            try:
                self._encode(*item)
            except Exception as e:
                self._err = e
                return

    def write(self, frame: np.ndarray, format: str | None = None):
        frame = np.asarray(frame)
        if self._q is not None:
            if self._err:
                raise self._err
            self._q.put((frame, format))
        else:
            self._encode(frame, format)

    def close(self):
        if self._h:
            if self._q is not None:
                self._q.put(None)
                self._thread.join()
                if self._err:
                    raise self._err
            rc = self._lib.pvc_close_writer(self._h)
            self._h = None
            if rc != 0:
                raise IOError(f"finalize error: {_last_error()}")

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
