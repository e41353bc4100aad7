"""Tests for the transient-dispatch retry helper (utils/retry.py)."""

import pytest

from gluefactory_tpu.utils.retry import is_transient_error, retry_transient


class XlaRuntimeError(Exception):
    """Same type NAME as jaxlib's — classification is name-based."""


def test_retries_transient_then_succeeds():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise XlaRuntimeError("UNAVAILABLE: Socket closed")
        return "ok"

    assert retry_transient(flaky, retries=3, base_wait=0.0) == "ok"
    assert len(calls) == 3


def test_non_transient_raises_immediately():
    calls = []

    def bad():
        calls.append(1)
        raise ValueError("shape mismatch")

    with pytest.raises(ValueError):
        retry_transient(bad, retries=3, base_wait=0.0)
    assert len(calls) == 1


def test_programming_xla_error_not_retried():
    def bad():
        raise XlaRuntimeError("INVALID_ARGUMENT: dot dimension mismatch")

    with pytest.raises(XlaRuntimeError):
        retry_transient(bad, retries=3, base_wait=0.0)


def test_gives_up_after_retries():
    calls = []

    def always_down():
        calls.append(1)
        raise ConnectionError("relay down")

    with pytest.raises(ConnectionError):
        retry_transient(always_down, retries=2, base_wait=0.0)
    assert len(calls) == 3


def test_classification():
    assert is_transient_error(TimeoutError())
    assert is_transient_error(XlaRuntimeError("DEADLINE_EXCEEDED while fetching"))
    assert not is_transient_error(KeyError("x"))
    assert not is_transient_error(XlaRuntimeError("INVALID_ARGUMENT"))
