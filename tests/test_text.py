"""Text function library vs reference semantics (SURVEY §2.4).

Mirrors (and extends) the reference's own unit suite
(`tests/test_text_utils.py:10-48` in /root/reference), which targets the
llmsgen-tree variants: clean_title, extract_domain_from_url,
is_navigation_text(threshold_ratio).
"""

from web2llmstxt_ray.functions import text as T


class TestCleanTitle:
    def test_strips_site_suffix(self):
        assert T.clean_title("Getting Started - Acme Docs") == "Getting Started"
        assert T.clean_title("Page | Site") == "Page"
        assert T.clean_title("Post – Blog") == "Post"

    def test_entities_and_tags(self):
        assert T.clean_title("A &amp; B <b>bold</b> story") == "A B bold story"

    def test_case_normalization(self):
        assert T.clean_title("all lower title") == "All Lower Title"
        assert T.clean_title("ALL UPPER") == "All Upper"
        assert T.clean_title("Mixed Case Kept") == "Mixed Case Kept"

    def test_empty(self):
        assert T.clean_title("") == "Untitled Page"
        assert T.clean_title(None) == "Untitled Page"


class TestExtractTitle:
    def test_meta_first(self):
        assert T.extract_title("Meta Title", "# H1 Title", "https://a.test/x") == "Meta Title"

    def test_h1_fallback(self):
        assert T.extract_title(None, "# H1 Title\nbody", "https://a.test/x") == "H1 Title"

    def test_slug_fallback(self):
        got = T.extract_title(None, "no heading", "https://a.test/getting-started")
        assert got == "Getting Started"

    def test_untitled(self):
        assert T.extract_title(None, "", "") == "Untitled Page"


class TestNavigation:
    def test_nav_dense(self):
        assert T.is_navigation_text("menu search filter")  # 3 hits / 3 words

    def test_prose_not_nav(self):
        assert not T.is_navigation_text(
            "This engine processes large corpora of documents with Ray Data")

    def test_threshold_respected(self):
        text = "menu " + "words " * 9  # 1 hit / 10 words = 0.1
        assert not T.is_navigation_text(text, threshold_ratio=0.3)
        assert T.is_navigation_text(text, threshold_ratio=0.05)

    def test_empty(self):
        assert not T.is_navigation_text("")


class TestSentences:
    def test_good_sentence(self):
        assert T.is_good_sentence("This library provides distributed crawling for large sites.")

    def test_too_short_and_too_long(self):
        assert not T.is_good_sentence("Tiny.")
        assert not T.is_good_sentence("x" * 300)

    def test_symbol_soup_rejected(self):
        assert not T.is_good_sentence("@@@@ #### $$$$ %%%% ^^^^ &&&&")

    def test_clean_sentence(self):
        assert T.clean_sentence("hello   world!!!") == "Hello world."
        assert T.clean_sentence("already Good.") == "Already Good."
        assert T.clean_sentence("no punct") == "No punct."


class TestDescriptions:
    def test_fallback_deterministic_matches_golden_shape(self):
        # Mirrors the reference golden output/example.com-llms.txt:9:
        # "Content related to Mock Page 1 Title. From example.com."
        desc = T.create_smart_fallback_description(
            "Mock Page 1 Title", "some generic words here", "https://example.com/test_mock_crawl/page1")
        assert desc == "Content related to Mock Page 1 Title. From example.com."

    def test_content_type_sniffing(self):
        assert T.create_initial_content_description("X", "full api documentation here") == \
            "API documentation for X."
        assert T.create_initial_content_description("X", "a tutorial for beginners") == \
            "Tutorial and guide for X."
        assert T.create_initial_content_description("X", "our pricing tiers") == \
            "Pricing information for X."

    def test_hallucination_blacklist(self):
        assert T.detect_hallucination(
            "The game character uses proof by contradiction", "Title", "content here")

    def test_hallucination_overlap(self):
        assert not T.detect_hallucination(
            "Documentation about widgets and sprockets",
            "Widgets and Sprockets", "widgets sprockets machines")
        assert T.detect_hallucination(
            "Totally unrelated ramble text", "Quantum Widgets", "quantum widget specs")


class TestMisc:
    def test_page_separators(self):
        text = "a\n<|crawl4ai-page-3-lllmstxt|>\nb\n---\n\nc\n\n\n\nd"
        out = T.remove_page_separators(text)
        assert "crawl4ai" not in out and "\n\n\n" not in out

    def test_limit_pages(self):
        text = "hdr<|crawl4ai-page-1-lllmstxt|>one<|crawl4ai-page-2-lllmstxt|>two"
        assert "two" not in T.limit_pages_in_full_text(text, 1)
        assert "one" in T.limit_pages_in_full_text(text, 1)

    def test_truncate(self):
        assert T.truncate_text("short", 10) == "short"
        out = T.truncate_text("one two three four five", 12)
        assert out.endswith("...") and len(out) <= 15

    def test_extract_words_stopwords(self):
        assert T.extract_words("the quick brown fox and the dog") == \
            ["quick", "brown", "fox", "dog"]

    def test_jaccard(self):
        assert T.text_similarity("alpha beta gamma", "alpha beta gamma") == 1.0
        assert T.text_similarity("alpha beta", "gamma delta") == 0.0

    def test_content_hash_stable(self):
        h1 = T.content_hash("T", "c" * 2000)
        h2 = T.content_hash("T", "c" * 1000 + "different tail")
        assert h1 == h2  # only first 1000 chars of content participate
