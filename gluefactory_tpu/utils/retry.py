"""Retry helper for transient backend/transport failures.

On relayed PJRT backends (the axon-tunneled TPU used here), long training
runs can hit transient HTTP/transport hiccups mid-dispatch or while fetching
values. Every jitted step in this codebase is a pure function of its inputs
(no buffer donation — see train.py), so re-issuing the identical dispatch is
safe and yields the identical result. This wrapper retries ONLY errors that
look transport/transient; programming errors propagate immediately.

(The reference has no analog: NCCL failures on local GPUs are fatal. This is
a TPU-era robustness addition, SURVEY §5.3.)
"""

from __future__ import annotations

import logging
import time

logger = logging.getLogger(__name__)

# substrings of error messages that indicate a transient transport/backend
# failure worth retrying (gRPC status names, HTTP, socket-level errors)
_TRANSIENT_MARKERS = (
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "INTERNAL",
    "ABORTED",
    "RESOURCE_EXHAUSTED",  # transient HBM/queue pressure through the relay
    "Connection",
    "connection",
    "HTTP",
    "Socket closed",
    "timed out",
    "Timeout",
    "EOF",
)


def is_transient_error(e: BaseException) -> bool:
    if isinstance(e, (ConnectionError, TimeoutError, OSError)):
        return True
    name = type(e).__name__
    if name not in ("XlaRuntimeError", "RpcError", "InternalError", "JaxRuntimeError"):
        return False
    msg = str(e)
    return any(m in msg for m in _TRANSIENT_MARKERS)


def retry_transient(fn, *args, retries: int = 3, base_wait: float = 5.0, **kwargs):
    """Call `fn(*args, **kwargs)`, retrying transient backend errors with
    exponential backoff. `fn` MUST be idempotent (pure dispatch / value
    fetch)."""
    attempt = 0
    while True:
        try:
            return fn(*args, **kwargs)
        except BaseException as e:
            if attempt >= retries or not is_transient_error(e):
                raise
            wait = base_wait * (2**attempt)
            logger.warning(
                "transient backend error (attempt %d/%d), retrying in %.0fs: %s",
                attempt + 1, retries, wait, e,
            )
            time.sleep(wait)
            attempt += 1
