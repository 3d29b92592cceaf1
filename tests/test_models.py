"""Model registry / client surface (SURVEY T1-T4, §2.12)."""

import pytest

from web2llmstxt_ray import models as M


class TestRegistry:
    def test_dispatch(self):
        assert isinstance(M.make_client(M.DEFAULT_MODELS[0]),
                          M.DeterministicClient)
        assert isinstance(
            M.make_client(M.ModelConfig("x", "x", provider="extractive")),
            M.ExtractiveClient)

    def test_unknown_provider(self):
        with pytest.raises(ValueError):
            M.make_client(M.ModelConfig("x", "x", provider="nope"))

    def test_ollama_client_constructs_without_server(self):
        # real client now: a dead endpoint degrades (warmed_up False),
        # it does not raise — the fallback chain stays usable
        c = M.make_client(M.ModelConfig("g", "g", provider="ollama"))
        assert isinstance(c, M.OllamaClient)
        assert c.warmed_up is False

    def test_gemini_constructs_and_degrades_without_key(self):
        # real REST client (protocol behavior tested over loopback in
        # test_network_models.py); keyless generate degrades to None
        # without any network traffic
        c = M.GeminiClient(M.ModelConfig("g", "g", provider="gemini"),
                           api_key="")
        assert c.generate("t", "c", "https://x.test/") is None
        assert c.stats["total_requests"] == 0

    def test_pick_model_ram_gate(self):
        huge = M.ModelConfig("big", "big", provider="ollama", est_ram_gb=1e9)
        small = M.ModelConfig("small", "small", provider="deterministic")
        assert M.pick_model((huge, small)).model_id == "small"

    def test_pick_model_prefers_provider(self):
        got = M.pick_model(prefer_provider="extractive")
        assert got.provider == "extractive"


class TestGenerationFlow:
    def test_deterministic_client(self):
        desc, fb = M.generate_description(
            M.DeterministicClient(), "My Page",
            "pricing plans for teams", "https://a.test/x")
        assert desc == "Pricing information for My Page. From a.test."

    def test_extractive_client(self):
        content = ("This engine provides distributed crawling for very "
                   "large websites. It is built on Ray Data and Arrow. " * 3)
        desc, fb = M.generate_description(
            M.ExtractiveClient(), "Engine", content, "https://a.test/x")
        assert "distributed crawling" in desc
        assert not fb

    def test_hallucination_gated_falls_back(self):
        class BadClient:
            def generate(self, title, content, url):
                return "the game character uses proof by contradiction"

        desc, fb = M.generate_description(
            BadClient(), "Widget Docs", "widget documentation and docs",
            "https://a.test/w")
        assert fb
        assert "Widget Docs" in desc

    def test_failing_client_falls_back(self):
        class Exploding:
            def generate(self, title, content, url):
                raise RuntimeError("model down")

        desc, fb = M.generate_description(
            Exploding(), "T", "some content about things", "https://a.test")
        assert fb and desc
