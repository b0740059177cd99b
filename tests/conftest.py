"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA aborts the PROCESS when one module's partition threads take >40 s
    # to all reach a cross-partition collective (rendezvous.cc) — on a
    # loaded single-core host that's slow-but-correct, not stuck.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags
# never hit the network from tests (the downloader tests override this and
# point the endpoints at a local HTTP server)
os.environ.setdefault("VIDEO_STYLER_OFFLINE", "1")

import jax  # noqa: E402

# The axon TPU plugin ignores the env var; force the CPU backend explicitly so
# tests are deterministic and the virtual 8-device mesh is available.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (full tier; the "
                          "default run is the <5-min quick tier)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy parity/pipeline test, skipped by default "
                   "(run with --runslow or RUN_SLOW=1)")


SLOW_THRESHOLD_S = 5.0


def _recorded_durations():
    """tests/durations.json: per-test wall times from a full --runslow
    --durations=0 run (regenerate by piping that run's durations block
    through the snippet in PROGRESS.md). Tests above SLOW_THRESHOLD_S are
    auto-tiered slow; tests absent from the file (new tests) stay quick."""
    import json
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "durations.json")
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return {}


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow tier: use --runslow or RUN_SLOW=1")
    durations = _recorded_durations()
    for item in items:
        nodeid = "tests/" + item.nodeid.split("tests/")[-1] \
            if "tests/" in item.nodeid else f"tests/{item.nodeid}"
        if "slow" in item.keywords or \
                durations.get(nodeid, 0.0) >= SLOW_THRESHOLD_S:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def rng():
    import jax
    return jax.random.PRNGKey(0)
