"""Session-scoped Ray fixture (one ray.init per pytest session)."""

from __future__ import annotations

import logging

import pytest
import ray
import ray.data


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """Deterministic planted corpus shared across pipeline tests."""
    from mail_deduplicate_ray import synth
    return synth.generate_clips(150, seed=42)
