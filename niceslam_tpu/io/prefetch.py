"""Background frame prefetcher: overlap host decode with device compute.

The reference decodes synchronously in the tracking loop (reference:
src/inputs/CoFusionReader.cpp:36-60 called from the driver). Here a worker
thread stays ``prefetch_depth`` frames ahead, decoding and ``device_put``-ing
frames so the SLAM loop never blocks on file I/O (SURVEY.md §2.1.7). An
optional native C++ decode pool (native/) can be plugged in as the reader.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax

from .datasets.base import Frame, FrameReader


class Prefetcher:
    def __init__(
        self,
        reader: FrameReader,
        prefetch_depth: int = 4,
        device: Optional[jax.Device] = None,
        start: int = 0,
        end: Optional[int] = None,
    ):
        self.reader = reader
        self.q: queue.Queue = queue.Queue(maxsize=prefetch_depth)
        self.device = device
        self.start = start
        self.end = len(reader) if end is None else end
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._stop = threading.Event()
        self._thread.start()

    def _work(self):
        try:
            for i in range(self.start, self.end):
                if self._stop.is_set():
                    return
                frame = self.reader[i]
                if self.device is not None:
                    frame = Frame(
                        idx=frame.idx,
                        color=jax.device_put(frame.color, self.device),
                        depth=jax.device_put(frame.depth, self.device),
                        gt_c2w=frame.gt_c2w,
                    )
                self.q.put(frame)
        except BaseException as e:  # noqa: BLE001 — re-raised in __iter__
            # A decode/IO failure must abort the run, not silently truncate
            # it as an apparent end-of-stream (ADVICE r1 low #2).
            self.q.put(e)
        finally:
            self.q.put(None)

    def __iter__(self) -> Iterator[Frame]:
        while True:
            frame = self.q.get()
            if frame is None:
                return
            if isinstance(frame, BaseException):
                raise RuntimeError(
                    "prefetch worker failed while decoding a frame"
                ) from frame
            yield frame

    def close(self):
        self._stop.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
