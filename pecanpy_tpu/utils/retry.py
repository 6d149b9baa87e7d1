"""Bounded retry around first device contact (tunnel resilience).

The TPU in this class of environments is reached through a remote
tunnel, and the very first backend initialization or dispatch of a
process can fail transiently ("Unable to initialize backend 'axon':
UNAVAILABLE", DEADLINE_EXCEEDED, dropped RPC) even though an immediate
retry succeeds. The reference never faces this (it is CPU-only), but a
benchmark or pipeline that dies on one flaky RPC produces no evidence
at all — so every harness entry point probes the backend through
``warmup_backend`` and wraps its first real dispatch in
``retry_transient``.

Policy: retry ONLY errors that look transient (substring match on the
well-known RPC/infra markers below), with exponential backoff, at most
``attempts`` tries, resetting JAX's cached backend state between tries
(a failed init may otherwise be sticky for the process lifetime).
Everything else — shape errors, OOMs, user bugs — raises immediately.
"""
import sys
import time
from typing import Callable, Optional, Sequence, TypeVar

T = TypeVar("T")

# substrings of exception text that mark a transiently-failed device
# contact (gRPC status names + the JAX backend-init wrapper text)
TRANSIENT_MARKERS: Sequence[str] = (
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "Unable to initialize backend",
    "failed to connect",
    "Connection reset",
    "Socket closed",
    "RPC failed",
    "transport is closing",
)


def is_transient(exc: BaseException) -> bool:
    """Does this exception look like a transient device/tunnel fault?"""
    text = f"{type(exc).__name__}: {exc}"
    return any(marker in text for marker in TRANSIENT_MARKERS)


def _reset_backend_state() -> None:
    """Drop JAX's cached (possibly failed) backend clients, if any.

    Best-effort: only touches JAX when it is already imported, and
    tolerates the API being absent. Without this, a failed first init
    can be sticky for the process lifetime.
    """
    jax = sys.modules.get("jax")
    if jax is None:
        return
    try:
        import jax.extend.backend as _jeb

        _jeb.clear_backends()
    except Exception:
        pass


def retry_transient(
    fn: Callable[..., T],
    *args,
    attempts: int = 5,
    base_delay: float = 2.0,
    max_delay: float = 30.0,
    label: Optional[str] = None,
    sleep: Callable[[float], None] = time.sleep,
    **kwargs,
) -> T:
    """Call ``fn(*args, **kwargs)``, retrying transient device faults.

    Non-transient exceptions propagate immediately; transient ones are
    retried up to ``attempts`` total tries with exponential backoff
    (``base_delay * 2**try``, capped at ``max_delay``), resetting the
    cached JAX backend state between tries. The last failure re-raises.

    ``sleep`` is injectable for tests.
    """
    name = label or getattr(fn, "__name__", "call")
    last: Optional[BaseException] = None
    for i in range(max(int(attempts), 1)):
        try:
            return fn(*args, **kwargs)
        except Exception as exc:  # noqa: BLE001 — filtered below
            if not is_transient(exc):
                raise
            last = exc
            if i == attempts - 1:
                break
            delay = min(base_delay * (2.0**i), max_delay)
            print(
                f"[pecanpy-tpu] transient device fault in {name} "
                f"(attempt {i + 1}/{attempts}): {exc}\n"
                f"[pecanpy-tpu] retrying in {delay:.1f}s...",
                file=sys.stderr,
                flush=True,
            )
            _reset_backend_state()
            sleep(delay)
    assert last is not None
    raise last


def warmup_backend(
    attempts: int = 5,
    base_delay: float = 2.0,
    max_delay: float = 30.0,
) -> list:
    """Initialize the JAX backend and push one tiny dispatch through it.

    Returns ``jax.local_devices()`` once a real device round trip
    succeeds. Call this BEFORE building device-resident state in any
    harness whose evidence must survive a flaky first RPC (bench.py and
    the ``benchmarks/`` scripts all do).
    """

    def probe():
        import jax
        import jax.numpy as jnp
        import numpy as np

        devices = jax.local_devices()
        # force an actual device round trip, not just client creation
        out = np.asarray(jnp.arange(8) + 1)
        assert int(out[-1]) == 8
        return devices

    return retry_transient(
        probe,
        attempts=attempts,
        base_delay=base_delay,
        max_delay=max_delay,
        label="backend warmup",
    )
