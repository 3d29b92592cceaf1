"""Shared fixtures: ONE Ray session per pytest session."""

from __future__ import annotations

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_site():
    """Deterministic 120-page 3-host synthetic site + robots."""
    from web2llmstxt_ray.synth import generate_site, site_index

    site, robots = generate_site(num_pages=120, num_hosts=3, seed=42)
    return site, robots, site_index(site)


@pytest.fixture(scope="session")
def disallow_by_host(small_site):
    _, robots, _ = small_site
    cols = robots.to_pydict()
    return dict(zip(cols["host"], cols["disallow"]))
