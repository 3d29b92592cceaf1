"""Model registry + AI description clients (SURVEY §1.4, T1-T4).

Mirrors the reference's provider surface from scratch:

- :class:`ModelConfig` — the registry entry dataclass
  (``models/config_types.py:12-28`` / ``llmsgen/models/config_types.py:7-23``).
- :class:`DescriptionClient` protocol — the provider plug-in point
  (``models/client.py:321-341`` dispatches on ``ModelConfig.provider``).
- :class:`DeterministicClient` — the engine's default/test client: the
  reference's testing-instrumented path bypasses AI entirely and always
  uses ``create_smart_fallback_description`` (pyc
  ``generate_description_with_fallbacks`` docstring: "FOR TESTING:
  Always uses fallback description logic").
- :class:`OllamaClient` — REAL Ollama-protocol HTTP provider logic
  (session pooling, warm-up, adaptive timeouts, retry/backoff, stats —
  ``llmsgen/models/client.py:16-169``), exercised in-sandbox against
  the loopback fixture server. Its construction cost is exactly what
  the Describer actor pool amortizes (one warm-up per actor, T2).
- :class:`GeminiClient` — stub: a cloud API with an SDK dependency
  that has no loopback-testable contract in this sandbox.
- :func:`pick_model` — the RAM-gate model selection
  (``models/client.py:149-157``; psutil-gated, heuristic preserved).

Generation flow per entry (``generator/llms_generator.py:511-570``):
cache probe → client.generate → hallucination gate (M16) → fallback.
That flow lives in :func:`generate_description`.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Protocol

from .functions.text import (
    create_smart_fallback_description, detect_hallucination, extract_key_sentences)


@dataclass
class ModelConfig:
    """Registry entry for a description model
    (models/config_types.py:12-28)."""

    model_id: str
    display_name: str
    provider: str = "deterministic"   # deterministic | ollama | gemini
    context_window: int = 4096
    est_ram_gb: float = 0.0
    temperature: float = 0.3
    top_k: int = 40
    top_p: float = 0.9
    repeat_penalty: float = 1.1
    timeout_s: float = 180.0          # generator/llms_generator.py:630
    tags: list[str] = field(default_factory=list)
    status: str = "available"         # available | offline


DEFAULT_MODELS = (
    ModelConfig("deterministic-fallback", "Deterministic fallback (no AI)",
                provider="deterministic", est_ram_gb=0.0),
    ModelConfig("extractive-summary", "Extractive key-sentence summarizer",
                provider="extractive", est_ram_gb=0.0),
    ModelConfig("gemma3:latest", "Gemma 3 (Ollama)", provider="ollama",
                est_ram_gb=8.0, tags=["local"]),
)


class DescriptionClient(Protocol):
    """Provider plug-in point: one method, batch-friendly."""

    def generate(self, title: str, content: str, url: str) -> str | None:
        """A description, or None on failure (caller falls back)."""


class DeterministicClient:
    """The reference's always-fallback test path — deterministic."""

    def generate(self, title: str, content: str, url: str) -> str | None:
        return create_smart_fallback_description(title, content, url)


class ExtractiveClient:
    """Key-sentence extractive summarizer (M14) — deterministic, richer
    than the template fallback; no model needed."""

    def generate(self, title: str, content: str, url: str) -> str | None:
        return extract_key_sentences(title, content)


MAX_GEN_OUTPUT_TOKENS = 300      # description budget
LOCAL_MODEL_TIMEOUT_S = 180.0    # llmsgen/models/client.py:45-52


class OllamaClient:
    """Local Ollama-protocol HTTP provider (T1,
    ``llmsgen/models/client.py:16-139``) — real request/retry/stats/
    warm-up logic, exercised in-sandbox against the loopback fixture
    server (``web2llmstxt_ray.testing`` serves the same
    ``POST /api/generate`` contract).

    Reference behaviors mirrored:

    - one pooled HTTP session per client, JSON content type (``:22-23``);
    - warm-up prompt on construction (T2, ``models/client.py:102-137``:
      tiny "respond with just 'Ready'" generation, 60 s timeout;
      failure leaves the client usable — calls may still succeed);
    - adaptive timeout by model RAM class (``llmsgen/models/client.py:
      45-52``): base 180 s, ×1.5 above 8 GB, ×2 above 12 GB;
    - 3 attempts with exponential backoff 4→10 s (tenacity policy at
      ``:55``; implemented inline — tenacity isn't vendored here);
    - rolling stats {requests, tokens, seconds, timeouts, errors} and
      the tokens/s rating bands >50 excellent / >20 good / >10 fair
      (``:141-169``).

    ``generate`` returns None on exhausted retries so the
    hallucination-gated fallback chain still yields a description.
    """

    WARMUP_PROMPT = "Hello, respond with just 'Ready'"

    def __init__(self, config: ModelConfig,
                 base_url: str = "http://localhost:11434",
                 warm_up: bool = True, retry_sleep_s: float | None = None):
        import requests

        self.config = config
        self.base_url = base_url.rstrip("/")
        self.session = requests.Session()
        self.session.headers.update({"Content-Type": "application/json"})
        self.stats = {"total_requests": 0, "total_tokens_generated": 0,
                      "total_time_seconds": 0.0, "timeouts": 0, "errors": 0}
        self._retry_sleep_s = retry_sleep_s  # test override for backoff
        self.warmed_up = self.warm_up() if warm_up else False

    # -- plumbing ----------------------------------------------------------

    def _adaptive_timeout_s(self) -> float:
        base = LOCAL_MODEL_TIMEOUT_S
        if self.config.est_ram_gb > 12:
            return base * 2
        if self.config.est_ram_gb > 8:
            return base * 1.5
        return base

    def _post_generate(self, prompt: str, num_predict: int,
                       timeout_s: float) -> str:
        """One POST /api/generate; raises on transport errors or bad
        status so the retry loop can count and back off."""
        import time as _time

        import requests

        t0 = _time.monotonic()
        self.stats["total_requests"] += 1
        try:
            resp = self.session.post(
                f"{self.base_url}/api/generate",
                json={
                    "model": self.config.model_id,
                    "prompt": prompt,
                    "stream": False,
                    "options": {
                        "temperature": self.config.temperature,
                        "num_predict": num_predict,
                        "num_ctx": self.config.context_window,
                        "top_k": self.config.top_k,
                        "top_p": self.config.top_p,
                        "repeat_penalty": self.config.repeat_penalty,
                    },
                },
                timeout=timeout_s,
            )
            resp.raise_for_status()
        except requests.exceptions.Timeout:
            self.stats["timeouts"] += 1
            raise
        except requests.exceptions.RequestException:
            self.stats["errors"] += 1
            raise
        text = (resp.json().get("response") or "").strip()
        self.stats["total_time_seconds"] += _time.monotonic() - t0
        self.stats["total_tokens_generated"] += len(text.split())
        return text

    def _with_retries(self, prompt: str, num_predict: int,
                      timeout_s: float, attempts: int = 3) -> str | None:
        import time as _time

        import requests

        for attempt in range(attempts):
            try:
                return self._post_generate(prompt, num_predict, timeout_s)
            except requests.exceptions.RequestException:
                if attempt == attempts - 1:
                    return None
                sleep = (self._retry_sleep_s if self._retry_sleep_s is not None
                         else min(4 * 2 ** attempt, 10))
                _time.sleep(sleep)
        return None

    # -- API ---------------------------------------------------------------

    def warm_up(self) -> bool:
        """T2: one tiny generation to page the model in (60 s budget);
        False on failure without raising."""
        import requests

        try:
            self._post_generate(self.WARMUP_PROMPT, num_predict=10,
                                timeout_s=60.0)
            return True
        except requests.exceptions.RequestException:
            return False

    def generate(self, title: str, content: str, url: str) -> str | None:
        prompt = (
            "Write a one-sentence description of this web page for an "
            "llms.txt index. Respond with only the description.\n"
            f"URL: {url}\nTitle: {title}\nContent:\n{content[:2000]}"
        )
        return self._with_retries(prompt, MAX_GEN_OUTPUT_TOKENS,
                                  self._adaptive_timeout_s())

    def performance_report(self) -> dict:
        """Rolling stats + the reference's tokens/s rating bands."""
        s = self.stats
        tps = (s["total_tokens_generated"] / s["total_time_seconds"]
               if s["total_time_seconds"] > 0 else 0.0)
        rating = ("excellent" if tps > 50 else "good" if tps > 20
                  else "fair" if tps > 10 else "slow")
        ok = s["total_requests"] - s["errors"] - s["timeouts"]
        return {**s, "tokens_per_second": round(tps, 2), "rating": rating,
                "success_rate": (ok / s["total_requests"]
                                 if s["total_requests"] else 0.0)}


class GeminiClient:
    """Cloud Gemini provider over the public ``generateContent`` REST
    protocol (the reference drives the same API through the
    ``google-generativeai`` SDK — ``models/client.py:302-311,385-411``).
    Real request/retry/stats logic, exercised in-sandbox against the
    loopback fixture server's Gemini route.

    Reference behaviors mirrored:

    - API key from ``GEMINI_API_KEY`` (``models/client.py:36``); a
      missing key makes ``generate`` return None (the reference logs
      and degrades, ``:389-391``);
    - 60 s cloud timeout (``_get_adaptive_timeout``, ``:313-317``);
    - 3 attempts, exponential backoff 4→10 s (tenacity policy,
      ``:320,384``);
    - temperature + max output tokens in the generation config
      (``:397-400``); empty candidate list → None (``:407-410``);
    - no warm-up: the reference warms only local models.
    """

    def __init__(self, config: ModelConfig, api_key: str | None = None,
                 base_url: str =
                 "https://generativelanguage.googleapis.com",
                 retry_sleep_s: float | None = None):
        import requests

        self.config = config
        self.api_key = (api_key if api_key is not None
                        else os.environ.get("GEMINI_API_KEY", ""))
        self.base_url = base_url.rstrip("/")
        self.session = requests.Session()
        self.session.headers.update({"Content-Type": "application/json"})
        self.stats = {"total_requests": 0, "total_tokens_generated": 0,
                      "total_time_seconds": 0.0, "timeouts": 0, "errors": 0}
        self._retry_sleep_s = retry_sleep_s

    TIMEOUT_S = 60.0  # cloud models: fixed budget, no RAM banding

    def _post_generate(self, prompt: str, max_tokens: int) -> str:
        import time as _time

        import requests

        t0 = _time.monotonic()
        self.stats["total_requests"] += 1
        url = (f"{self.base_url}/v1beta/models/"
               f"{self.config.model_id}:generateContent")
        try:
            resp = self.session.post(
                url, params={"key": self.api_key},
                json={
                    "contents": [{"parts": [{"text": prompt}]}],
                    "generationConfig": {
                        "temperature": self.config.temperature,
                        "maxOutputTokens": max_tokens,
                    },
                },
                timeout=self.TIMEOUT_S,
            )
            resp.raise_for_status()
        except requests.exceptions.Timeout:
            self.stats["timeouts"] += 1
            raise
        except requests.exceptions.RequestException:
            self.stats["errors"] += 1
            raise
        cands = resp.json().get("candidates") or []
        parts = (cands[0].get("content", {}).get("parts", [])
                 if cands else [])
        text = " ".join(p.get("text", "") for p in parts).strip()
        self.stats["total_time_seconds"] += _time.monotonic() - t0
        self.stats["total_tokens_generated"] += len(text.split())
        return text

    def generate(self, title: str, content: str, url: str) -> str | None:
        import time as _time

        import requests

        if not self.api_key:
            return None
        prompt = (
            "Write a one-sentence description of this web page for an "
            "llms.txt index. Respond with only the description.\n"
            f"URL: {url}\nTitle: {title}\nContent:\n{content[:2000]}"
        )
        for attempt in range(3):
            try:
                text = self._post_generate(prompt, MAX_GEN_OUTPUT_TOKENS)
                return text or None          # empty candidates → None
            except requests.exceptions.RequestException:
                if attempt == 2:
                    return None
                sleep = (self._retry_sleep_s if self._retry_sleep_s is not None
                         else min(4 * 2 ** attempt, 10))
                _time.sleep(sleep)
        return None

    def performance_report(self) -> dict:
        s = self.stats
        tps = (s["total_tokens_generated"] / s["total_time_seconds"]
               if s["total_time_seconds"] > 0 else 0.0)
        rating = ("excellent" if tps > 50 else "good" if tps > 20
                  else "fair" if tps > 10 else "slow")
        ok = s["total_requests"] - s["errors"] - s["timeouts"]
        return {**s, "tokens_per_second": round(tps, 2), "rating": rating,
                "success_rate": (ok / s["total_requests"]
                                 if s["total_requests"] else 0.0)}


_CLIENTS = {
    "deterministic": DeterministicClient,
    "extractive": ExtractiveClient,
    "ollama": OllamaClient,
    "gemini": GeminiClient,
}


def make_client(config: ModelConfig) -> DescriptionClient:
    """Provider dispatch (models/client.py:321-341)."""
    try:
        cls = _CLIENTS[config.provider]
    except KeyError:
        raise ValueError(f"unknown provider: {config.provider}") from None
    if config.provider in ("deterministic", "extractive"):
        return cls()
    return cls(config)  # network providers take the config


def build_display_name(model_name: str) -> str:
    """Ollama tag → human display name (``models/client.py:206-220``):
    strip ``:latest``, underscores → spaces, dash-parts capitalized,
    size indicators (7b, 3.5b…) upper-cased."""
    clean = model_name.replace(":latest", "").replace("_", " ")
    parts = []
    for part in clean.split("-"):
        if part.replace(".", "").replace("b", "").isdigit():
            parts.append(part.upper())
        else:
            parts.append(part.capitalize())
    return " ".join(parts)


def estimate_model_ram_gb(model_name: str) -> float:
    """Name-based RAM estimate (``models/client.py:222-236``)."""
    m = model_name.lower()
    if "70b" in m or "72b" in m:
        return 40.0
    if "13b" in m or "14b" in m:
        return 8.0
    if "7b" in m or "8b" in m:
        return 4.0
    if "3b" in m or "1b" in m:
        return 2.0
    return 4.0


def list_ollama_models(base_url: str,
                       timeout_s: float = 10.0) -> dict[str, ModelConfig]:
    """Live local-model discovery via Ollama's ``GET /api/tags``
    (``models/client.py:174-204``): one ModelConfig per installed
    model, keyed ``ollama_<name>``; any connection/HTTP/JSON failure
    (daemon not running) returns ``{}`` — discovery is best-effort."""
    import requests

    models: dict[str, ModelConfig] = {}
    try:
        resp = requests.get(f"{base_url.rstrip('/')}/api/tags",
                            timeout=timeout_s)
        if resp.status_code != 200:
            return models
        for info in resp.json().get("models", []):
            name = info["name"]
            models[f"ollama_{name}"] = ModelConfig(
                model_id=name,
                display_name=build_display_name(name),
                provider="ollama",
                context_window=8192,
                est_ram_gb=estimate_model_ram_gb(name),
                temperature=0.7,
                tags=[f"Local Ollama model - {name}"],
                status="available",
            )
    except Exception:
        return {}
    return models


_GEMINI_CATALOG = (
    ("gemini-1.5-flash", "Gemini 1.5 Flash", 1_048_576,
     "Fast and efficient model optimized for speed"),
    ("gemini-1.5-pro", "Gemini 1.5 Pro", 2_097_152,
     "Advanced model with enhanced reasoning capabilities"),
    ("gemini-pro", "Gemini Pro", 32_768,
     "Production-ready model for complex tasks"),
)


def discover_models(ollama_base_url: str | None = None,
                    gemini_api_key: str | None = None
                    ) -> dict[str, ModelConfig]:
    """The reference's ``list_models`` composition
    (``models/client.py:159-172``): live Ollama tags (when a base url
    is given and the daemon answers) + the static Gemini catalog, whose
    status is ``available`` only with an API key. The deterministic /
    extractive fallbacks are always present so :func:`pick_model` over
    the result can never come up empty."""
    models: dict[str, ModelConfig] = {}
    if ollama_base_url:
        models.update(list_ollama_models(ollama_base_url))
    for mid, disp, ctx, desc in _GEMINI_CATALOG:
        models[f"gemini_{mid}"] = ModelConfig(
            model_id=mid, display_name=disp, provider="gemini",
            context_window=ctx, est_ram_gb=0.0, temperature=0.7,
            tags=[desc],
            status="available" if gemini_api_key else "offline",
        )
    for cfg in DEFAULT_MODELS:
        if cfg.provider in ("deterministic", "extractive"):
            models.setdefault(f"{cfg.provider}_{cfg.model_id}", cfg)
    return models


def available_ram_gb() -> float:
    """Best-effort free-RAM probe (psutil optional)."""
    try:
        import psutil

        return psutil.virtual_memory().available / (1 << 30)
    except ImportError:
        return float("inf")


def pick_model(models: tuple[ModelConfig, ...] = DEFAULT_MODELS,
               prefer_provider: str | None = None) -> ModelConfig:
    """RAM-gated model selection (models/client.py:149-157): first model
    whose estimated RAM fits available memory, optionally filtered by
    provider; deterministic fallback always fits."""
    ram = available_ram_gb()
    for m in models:
        if prefer_provider and m.provider != prefer_provider:
            continue
        if m.est_ram_gb <= ram:
            return m
    return DEFAULT_MODELS[0]


def generate_description(client: DescriptionClient, title: str, content: str,
                         url: str) -> tuple[str, bool]:
    """The reference's per-entry flow (generator/llms_generator.py:511-570)
    minus the cache probe (handled by the Describer's broadcast join):
    client → hallucination gate (M16) → deterministic fallback.

    Returns (description, used_fallback)."""
    desc = None
    try:
        desc = client.generate(title, content, url)
    except Exception:
        desc = None
    if desc and not detect_hallucination(desc, title, content):
        return desc, False
    return create_smart_fallback_description(title, content, url), True
