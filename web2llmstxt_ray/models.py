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
- :class:`OllamaClient` / :class:`GeminiClient` — clearly-marked stubs:
  no network exists in this sandbox. Their construction cost is exactly
  what the Describer actor pool amortizes (one warm-up per actor, T2:
  ``models/client.py:102-137``).
- :func:`pick_model` — the RAM-gate model selection
  (``models/client.py:149-157``; psutil-gated, heuristic preserved).

Generation flow per entry (``generator/llms_generator.py:511-570``):
cache probe → client.generate → hallucination gate (M16) → fallback.
That flow lives in :func:`generate_description`.
"""

from __future__ import annotations

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


class OllamaClient:  # pragma: no cover - network stub
    """STUB — local Ollama HTTP provider (T1,
    ``llmsgen/models/client.py:16-139``). In production ``__init__``
    holds one pooled HTTP session + does the warm-up prompt (T2) and
    ``generate`` POSTs /api/generate with the ModelConfig sampling
    params; per-call failures return None so the hallucination-gated
    fallback chain still yields a description."""

    def __init__(self, config: ModelConfig, base_url: str = "http://localhost:11434"):
        raise NotImplementedError(
            "No network in this sandbox; use DeterministicClient or "
            "ExtractiveClient. This class documents the production slot."
        )

    def generate(self, title: str, content: str, url: str) -> str | None:
        raise NotImplementedError


class GeminiClient:  # pragma: no cover - network stub
    """STUB — Gemini API provider (models/client.py:343-379)."""

    def __init__(self, config: ModelConfig, api_key: str):
        raise NotImplementedError("No network in this sandbox.")

    def generate(self, title: str, content: str, url: str) -> str | None:
        raise NotImplementedError


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
