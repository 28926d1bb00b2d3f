"""Bounded retry for transient TPU-backend failures (VERDICT r4 #1).

The axon tunnel to the TPU chip wedges sporadically: backend RPCs die
mid-flight with remote-compile / UNAVAILABLE / DEADLINE_EXCEEDED errors
and then recover on their own (CLAUDE.md "Environment gotchas"). Round 4
lost its official bench artifact to exactly this — ``lowered.compile()``
raised once at driver time and bench.py exited 1 while the same code
measured 76k samples/s when re-run minutes later.

This module gives the round artifacts (bench.py, __graft_entry__.py) a
bounded retry-with-backoff around backend init and lower/compile/execute
calls. Policy:

- only errors matching known-transient patterns are retried; programming
  errors (shape mismatches, tracer leaks, OOM) propagate immediately;
- exponential backoff between attempts (the wedge usually clears within
  ~a minute);
- the PJRT client is torn down between attempts (``jax.clear_backends``)
  so the retry reconnects instead of reusing a poisoned channel;
- after the final attempt the original exception propagates — callers
  exit nonzero only once retries are exhausted.

The reference has no counterpart (single local CUDA device, no RPC
surface, SURVEY.md §2.2).
"""

from __future__ import annotations

import re
import time
from typing import Callable, TypeVar

__all__ = ["is_transient_backend_error", "with_backend_retry", "retry_compile"]

T = TypeVar("T")

# Error-text fingerprints of the tunnel's observed transient failures.
# remote_compile: the r4 driver failure (axon remote-compile RPC died);
# UNAVAILABLE / DEADLINE_EXCEEDED / connection text: gRPC channel drops.
_TRANSIENT = re.compile(
    r"remote_compile"
    r"|UNAVAILABLE"
    r"|DEADLINE_EXCEEDED"
    r"|[Cc]onnection (?:reset|refused|closed|aborted)"
    r"|[Ss]ocket closed"
    r"|[Tt]ransport (?:closed|error)"
    r"|failed to connect"
    r"|[Bb]roken pipe",
)


def is_transient_backend_error(exc: BaseException) -> bool:
    """True when the exception text matches a known-transient tunnel/RPC
    failure (retry-worthy), False for everything else (a real bug)."""
    text = f"{type(exc).__name__}: {exc}"
    return bool(_TRANSIENT.search(text))


def _reset_backend() -> None:
    """Tear down the PJRT client so the next attempt reconnects.

    Best-effort across JAX versions: the wedge poisons the live channel,
    and retrying on it just re-raises; a fresh client usually succeeds
    once the tunnel recovers. NOTE: this invalidates every live device
    array — callers must rebuild all state after a reset (with_backend_
    retry is therefore wrapped around whole rebuild-and-run bodies, not
    bare compile calls)."""
    import jax

    cleared = False
    try:  # jax >= 0.9: public extension point
        import jax.extend.backend as _jeb

        _jeb.clear_backends()
        cleared = True
    except Exception:
        pass
    if not cleared:
        try:  # older jax: top-level API
            jax.clear_backends()  # type: ignore[attr-defined]
        except Exception:
            pass
    try:
        jax.clear_caches()
    except Exception:
        pass


def with_backend_retry(
    fn: Callable[[], T],
    retries: int = 3,
    base_delay: float = 10.0,
    reset_backend: bool = True,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Call ``fn()`` with up to ``retries`` retries on transient backend
    errors, exponential backoff (base_delay * 2**attempt), and a PJRT
    client reset between attempts. Non-transient errors and the final
    transient failure propagate unchanged."""
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — filtered by pattern below
            if attempt >= retries or not is_transient_backend_error(e):
                raise
            delay = base_delay * (2**attempt)
            print(
                f"transient backend error (attempt {attempt + 1}/"
                f"{retries + 1}), retrying in {delay:.0f}s: "
                f"{type(e).__name__}: {str(e)[:200]}",
                flush=True,
            )
            sleep(delay)
            if reset_backend:
                _reset_backend()
    raise AssertionError("unreachable")


def retry_compile(lowered, retries: int = 2, base_delay: float = 15.0, **kw):
    """``lowered.compile()`` with the transient-failure retry policy —
    the exact call BENCH_r04 died on (bench.py AOT path).

    Retries on the SAME client (no backend reset: the lowered artifact and
    all live arrays are tied to it). Callers wanting reconnect-and-rebuild
    semantics wrap their whole build+compile+run body in
    ``with_backend_retry(..., reset_backend=True)`` instead."""
    kw.setdefault("reset_backend", False)
    return with_backend_retry(
        lowered.compile, retries=retries, base_delay=base_delay, **kw
    )
