"""Usage limits + RPM/TPM rate limiting (reference ``lm.py:304-436``,
``types.py:258-278``).

- ``UsageLimit`` thresholds raise ``UsageLimitExceeded`` when an LM's
  accumulated usage crosses them — checked client-side after each batch, and
  designed to be checked on the driver between stages via accumulators.
- ``RateLimiter`` — token-bucket pacing for requests/min and tokens/min with
  a sliding 60 s window and a 5% safety buffer, like the reference's TPM
  limiter. Executor-local: on a cluster each executor enforces
  ``limit / expected_concurrent_executors`` (a global budget needs a
  partition-count cap, as SURVEY §4.3 documents).
"""

from __future__ import annotations

import threading
import time
from collections import deque
from dataclasses import dataclass
from typing import Any, Optional

from lotus_spark.models.lm import LMOutput


class UsageLimitExceeded(RuntimeError):
    pass


@dataclass
class UsageLimit:
    max_prompt_tokens: Optional[int] = None
    max_completion_tokens: Optional[int] = None
    max_calls: Optional[int] = None
    max_cost: Optional[float] = None

    def check(self, usage) -> None:
        for attr, cap in (
            ("prompt_tokens", self.max_prompt_tokens),
            ("completion_tokens", self.max_completion_tokens),
            ("virtual_calls", self.max_calls),
            ("cost", self.max_cost),
        ):
            if cap is not None and getattr(usage, attr) > cap:
                raise UsageLimitExceeded(
                    f"usage limit exceeded: {attr}={getattr(usage, attr)} > {cap}"
                )


class RateLimiter:
    """Sliding-window RPM/TPM limiter with a safety buffer."""

    def __init__(
        self,
        rpm: Optional[int] = None,
        tpm: Optional[int] = None,
        safety: float = 0.05,
        clock=time.monotonic,
        sleep=time.sleep,
    ):
        self.rpm = rpm
        self.tpm = tpm
        self.safety = safety
        self._clock = clock
        self._sleep = sleep
        self._req: deque[float] = deque()
        self._tok: deque[tuple[float, int]] = deque()
        self._lock = threading.Lock()

    def _prune(self, now: float) -> None:
        horizon = now - 60.0
        while self._req and self._req[0] < horizon:
            self._req.popleft()
        while self._tok and self._tok[0][0] < horizon:
            self._tok.popleft()

    def __getstate__(self):
        # ships as config: each executor enforces its own fresh window
        d = dict(self.__dict__)
        d["_lock"] = None
        d["_req"] = deque()
        d["_tok"] = deque()
        return d

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._lock = threading.Lock()

    def acquire(self, n_requests: int = 1, n_tokens: int = 0) -> None:
        """Block until the window has room, then record the spend."""
        while True:
            with self._lock:
                now = self._clock()
                self._prune(now)
                rpm_cap = self.rpm * (1 - self.safety) if self.rpm else None
                tpm_cap = self.tpm * (1 - self.safety) if self.tpm else None
                rpm_ok = rpm_cap is None or len(self._req) + n_requests <= rpm_cap
                tpm_ok = (
                    tpm_cap is None
                    or sum(t for _, t in self._tok) + n_tokens <= tpm_cap
                )
                if rpm_ok and tpm_ok:
                    for _ in range(n_requests):
                        self._req.append(now)
                    if n_tokens:
                        self._tok.append((now, n_tokens))
                    return
                wait = 0.25
                if not rpm_ok and self._req:
                    wait = max(wait, self._req[0] + 60.0 - now)
                if not tpm_ok and self._tok:
                    wait = max(wait, self._tok[0][0] + 60.0 - now)
            self._sleep(min(wait, 5.0))


class LimitedLM:
    """Wrap an LM with rate limiting + usage-limit enforcement."""

    def __init__(
        self,
        lm: Any,
        rate_limiter: Optional[RateLimiter] = None,
        usage_limit: Optional[UsageLimit] = None,
    ):
        self.lm = lm
        self.rate_limiter = rate_limiter
        self.usage_limit = usage_limit

    def __getattr__(self, name: str):
        if name == "lm" or "lm" not in self.__dict__:
            raise AttributeError(name)  # unpickling guard (see CachedLM)
        return getattr(self.lm, name)

    def __call__(self, batch: list, **kwargs: Any) -> LMOutput:
        if self.rate_limiter is not None:
            approx_tokens = sum(
                self.lm.count_tokens(str(m)) for msgs in batch for m in msgs
            )
            self.rate_limiter.acquire(len(batch), approx_tokens)
        out = self.lm(batch, **kwargs)
        if self.usage_limit is not None and hasattr(self.lm, "usage"):
            self.usage_limit.check(self.lm.usage)
        return out
