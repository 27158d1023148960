"""Shared REST plumbing: retry/backoff/rate-limit with an injectable
transport.

Policy parity with the reference clients (cnpj_core.py:60-125 — ≤4
retries, exponential backoff 0.8·2^n, 0.35 s pacing, 429/5xx retry,
404 → miss; PTAX - Conversor de Moedas BACEN.py:49-67 — 3 retries,
15 s timeout).  The transport seam replaces ``requests`` so the
container needs no network and tests drive every branch.
"""

from __future__ import annotations

import time
from collections.abc import Callable

# transport: url -> (status_code, parsed_json_or_None)
Transport = Callable[[str], tuple[int, object]]


def requests_transport(timeout: float = 15.0) -> Transport:
    """Production transport over ``requests`` (import-gated: absent in
    this container, so constructing it raises cleanly)."""
    try:
        import requests  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "requests not installed; inject a Transport instead"
        ) from exc

    def call(url: str) -> tuple[int, object]:  # pragma: no cover
        resp = requests.get(url, timeout=timeout)
        try:
            return resp.status_code, resp.json()
        except ValueError:
            return resp.status_code, None

    return call


class FixtureTransport:
    """Deterministic offline transport: maps url → (status, payload),
    recording the call sequence (lets tests assert pacing/fallback
    order)."""

    def __init__(self, fixtures: dict[str, tuple[int, object]], default_status: int = 404):
        self.fixtures = dict(fixtures)
        self.default_status = default_status
        self.calls: list[str] = []

    def __call__(self, url: str) -> tuple[int, object]:
        self.calls.append(url)
        return self.fixtures.get(url, (self.default_status, None))


class RestClient:
    """GET with retry on 429/5xx (exponential backoff), miss on 404,
    and inter-request pacing.  ``sleep`` is injectable so tests run
    instantly."""

    def __init__(
        self,
        transport: Transport,
        max_retries: int = 4,
        backoff_base: float = 0.8,
        pace_seconds: float = 0.35,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.transport = transport
        self.max_retries = max_retries
        self.backoff_base = backoff_base
        self.pace_seconds = pace_seconds
        self.sleep = sleep
        self._last_call = 0.0

    def get(self, url: str) -> object | None:
        """Returns parsed payload, or None for a definitive miss (404).
        Raises RuntimeError when retries are exhausted."""
        for attempt in range(self.max_retries + 1):
            if self.pace_seconds:
                self.sleep(self.pace_seconds)
            status, payload = self.transport(url)
            if status == 200:
                return payload
            if status == 404:
                return None
            if status == 429 or status >= 500:
                if attempt < self.max_retries:
                    self.sleep(self.backoff_base * (2**attempt))
                    continue
                raise RuntimeError(f"retries exhausted for {url} (last status {status})")
            raise RuntimeError(f"unexpected status {status} for {url}")
        return None  # pragma: no cover

    def get_first(self, urls: list[str]) -> object | None:
        """Multi-provider fallback (ref: cnpj_core.py two-registry
        chain): first definitive answer wins; a provider that errors
        out falls through to the next."""
        for url in urls:
            try:
                payload = self.get(url)
            except RuntimeError:
                continue
            if payload is not None:
                return payload
        return None
