"""Process-wide lock for host OpenCV calls.

Observed on this image (OpenCV 5.0): concurrent cv2 use from an XLA
pure_callback thread (LSD line detection) and the data-loading thread
(warpPerspective/resize) aborts the process at the C++ level — no Python
exception to catch. All host cv2 call sites acquire this lock; host image ops
are micro-seconds to milliseconds, so serialization is harmless next to the
device step.
"""

import threading
from concurrent.futures import ThreadPoolExecutor

CV2_LOCK = threading.RLock()

# XLA invokes pure_callbacks on its own internal threads, which have small
# stacks and no C++ exception handling; heavy host work (cv2 LSD etc.) there
# crashed intermittently. Run such work on one dedicated worker thread with a
# normal stack instead — this also serializes host vision work.
threading.stack_size(16 * 1024 * 1024)
_HOST_WORKER = ThreadPoolExecutor(max_workers=1, thread_name_prefix="hostvision")
threading.stack_size(0)


def run_on_host_worker(fn, *args, **kwargs):
    """Execute fn on the dedicated host-vision worker thread and wait."""
    return _HOST_WORKER.submit(fn, *args, **kwargs).result()
