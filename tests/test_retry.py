"""Transient-backend-failure retry tests (scrubvae_tpu/utils/retry.py).

VERDICT r4 #1: round 4's official bench artifact recorded rc=1 because a
single transient axon-tunnel remote-compile failure at driver time had no
retry around it. These tests inject that exact failure and pin the
policy: transient errors retry with backoff, real bugs propagate
immediately, exhaustion re-raises the original error."""

import pytest

from scrubvae_tpu.utils import retry as retry_mod
from scrubvae_tpu.utils.retry import (
    is_transient_backend_error,
    retry_compile,
    with_backend_retry,
)


class FakeTunnelError(RuntimeError):
    pass


def _no_sleep(_):
    pass


class TestTransientClassifier:
    @pytest.mark.parametrize(
        "msg",
        [
            # the BENCH_r04 failure fingerprint
            "remote_compile failed: connection dropped mid-lowering",
            "UNAVAILABLE: failed to connect to all addresses",
            "DEADLINE_EXCEEDED: RPC timed out",
            "Connection reset by peer",
            "Socket closed",
            "transport closed unexpectedly",
            "Broken pipe while writing to tunnel",
        ],
    )
    def test_transient_patterns_match(self, msg):
        assert is_transient_backend_error(FakeTunnelError(msg))

    @pytest.mark.parametrize(
        "msg",
        [
            "dot_general requires contracting dimensions to match, got (3,) and (4,)",
            "RESOURCE_EXHAUSTED: out of memory allocating 12.3G",
            "Leaked trace DynamicJaxprTrace",
            "NaN encountered in jit(train_step)",
        ],
    )
    def test_real_bugs_are_not_transient(self, msg):
        assert not is_transient_backend_error(FakeTunnelError(msg))


class TestWithBackendRetry:
    def test_one_transient_failure_then_success(self):
        """The r4 scenario: one remote_compile drop, then recovery."""
        calls = []

        def body():
            calls.append(1)
            if len(calls) == 1:
                raise FakeTunnelError("remote_compile RPC dropped")
            return "ok"

        out = with_backend_retry(
            body, retries=2, reset_backend=False, sleep=_no_sleep
        )
        assert out == "ok"
        assert len(calls) == 2

    def test_non_transient_propagates_immediately(self):
        calls = []

        def body():
            calls.append(1)
            raise ValueError("shape mismatch: (3,) vs (4,)")

        with pytest.raises(ValueError):
            with_backend_retry(
                body, retries=3, reset_backend=False, sleep=_no_sleep
            )
        assert len(calls) == 1

    def test_exhaustion_reraises_original_error(self):
        calls = []

        def body():
            calls.append(1)
            raise FakeTunnelError("UNAVAILABLE: tunnel wedged")

        with pytest.raises(FakeTunnelError):
            with_backend_retry(
                body, retries=2, reset_backend=False, sleep=_no_sleep
            )
        assert len(calls) == 3  # 1 try + 2 retries, then nonzero exit

    def test_backoff_is_exponential(self):
        delays = []

        def body():
            raise FakeTunnelError("Connection reset by peer")

        with pytest.raises(FakeTunnelError):
            with_backend_retry(
                body,
                retries=2,
                base_delay=10.0,
                reset_backend=False,
                sleep=delays.append,
            )
        assert delays == [10.0, 20.0]

    def test_backend_reset_runs_between_attempts(self, monkeypatch):
        resets = []
        monkeypatch.setattr(
            retry_mod, "_reset_backend", lambda: resets.append(1)
        )
        calls = []

        def body():
            calls.append(1)
            if len(calls) == 1:
                raise FakeTunnelError("transport error")
            return 7

        assert (
            with_backend_retry(body, retries=2, sleep=_no_sleep) == 7
        )
        assert resets == [1]


class TestRetryCompile:
    def test_lowered_compile_retried_without_reset(self, monkeypatch):
        """retry_compile must NOT reset the client: the lowered artifact
        and live arrays are tied to it."""
        resets = []
        monkeypatch.setattr(
            retry_mod, "_reset_backend", lambda: resets.append(1)
        )

        class FakeLowered:
            def __init__(self):
                self.n = 0

            def compile(self):
                self.n += 1
                if self.n == 1:
                    raise FakeTunnelError(
                        "remote_compile failed mid lowered.compile()"
                    )
                return "executable"

        lowered = FakeLowered()
        assert retry_compile(lowered, sleep=_no_sleep) == "executable"
        assert lowered.n == 2
        assert resets == []
