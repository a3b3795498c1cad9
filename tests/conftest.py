import os
import sys

import pytest
from hypothesis import settings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Deterministic property tests: the suite is a correctness gate; a randomly
# discovered counterexample should surface in development, not flake a gate.
settings.register_profile("deterministic", derandomize=True, deadline=None)
settings.load_profile("deterministic")

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole test run (per driver instruction)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def reference_modules():
    """Import the reference's pure-Python geometry modules (read-only, used
    ONLY as a differential-testing oracle; skipped when absent)."""
    if not os.path.isdir(os.path.join(REFERENCE_DIR, "services")):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from services.spatial_preprocessor import SpatialPreprocessor
        from services.coordinate_table_extractor import CoordinateTableExtractor
    except ImportError as exc:  # pragma: no cover
        pytest.skip(f"reference import failed: {exc}")
    return SpatialPreprocessor, CoordinateTableExtractor
