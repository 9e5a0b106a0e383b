"""Shared pytest fixtures. Ray is initialised ONCE per session."""

from __future__ import annotations

import shutil
import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_data_publisher_ray.sources.generator import LogSpec, cached_fixture  # noqa: E402


@pytest.fixture(scope="session")
def ray_session():
    import ray

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


# Small but non-trivial fixture: 10 epochs, ties, hot keys, deletes.
SMALL_SPEC = LogSpec(
    n_base=2_000,
    n_sites=40,
    n_events=10_000,
    epoch_size=1_000,
    chunk_size=3_000,
    html_min=16,
    html_max=64,
    text_pad=24,
)


@pytest.fixture(scope="session")
def small_log() -> str:
    return cached_fixture(SMALL_SPEC)


@pytest.fixture()
def lake_dir(tmp_path) -> str:
    d = str(tmp_path / "lake")
    yield d
    shutil.rmtree(d, ignore_errors=True)
