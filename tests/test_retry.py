"""Transient-device-fault retry wrapper (``utils/retry.py``).

The round-4 benchmark record was erased by ONE transient backend-init
RPC failure; these tests pin the recovery contract the harnesses now
rely on: transient faults retry with backoff, everything else raises
immediately, and exhaustion re-raises the last transient error.
"""
import pytest

from pecanpy_tpu.utils.retry import (
    is_transient,
    retry_transient,
    warmup_backend,
)


class _FlakyOnce:
    """Raises ``exc`` for the first ``fails`` calls, then returns 42."""

    def __init__(self, exc, fails=1):
        self.exc = exc
        self.fails = fails
        self.calls = 0

    def __call__(self):
        self.calls += 1
        if self.calls <= self.fails:
            raise self.exc
        return 42


def _no_sleep(_dt):
    pass


def test_transient_init_failure_is_retried():
    # the exact round-4 failure text
    fn = _FlakyOnce(
        RuntimeError(
            "Unable to initialize backend 'axon': UNAVAILABLE: TPU "
            "backend setup/compile error (Unavailable)."
        )
    )
    assert retry_transient(fn, attempts=3, sleep=_no_sleep) == 42
    assert fn.calls == 2


def test_multiple_transient_failures_then_success():
    fn = _FlakyOnce(RuntimeError("DEADLINE_EXCEEDED: rpc timed out"), fails=3)
    assert retry_transient(fn, attempts=5, sleep=_no_sleep) == 42
    assert fn.calls == 4


def test_non_transient_raises_immediately():
    fn = _FlakyOnce(ValueError("shapes do not match"), fails=10)
    with pytest.raises(ValueError):
        retry_transient(fn, attempts=5, sleep=_no_sleep)
    assert fn.calls == 1


def test_exhausted_attempts_reraise_last_error():
    fn = _FlakyOnce(RuntimeError("UNAVAILABLE: socket closed"), fails=10)
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        retry_transient(fn, attempts=3, sleep=_no_sleep)
    assert fn.calls == 3


def test_backoff_schedule_is_exponential_and_capped():
    delays = []
    fn = _FlakyOnce(RuntimeError("UNAVAILABLE"), fails=4)
    retry_transient(
        fn,
        attempts=5,
        base_delay=2.0,
        max_delay=5.0,
        sleep=delays.append,
    )
    assert delays == [2.0, 4.0, 5.0, 5.0]


def test_is_transient_classification():
    assert is_transient(RuntimeError("FAILED: UNAVAILABLE: tunnel down"))
    assert is_transient(
        RuntimeError("Unable to initialize backend 'axon': ...")
    )
    assert not is_transient(ValueError("bad shape"))
    assert not is_transient(RuntimeError("RESOURCE_EXHAUSTED: HBM OOM"))


def test_args_and_kwargs_forwarded():
    def add(a, b=0):
        return a + b

    assert retry_transient(add, 1, b=2, sleep=_no_sleep) == 3


def test_warmup_backend_runs_real_probe():
    # on the test (CPU) backend this must succeed first try
    devices = warmup_backend(attempts=2)
    assert len(devices) >= 1
