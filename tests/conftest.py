import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running smoke (JVM cold starts, submit jobs)"
    )


@pytest.fixture(scope="session")
def spark():
    from extractor.session import get_spark

    s = get_spark(master="local[4]", app_name="tests", shuffle_partitions=4)
    yield s
    s.stop()


# Deterministic hypothesis runs (no random seeds -> no surprise multi-minute
# examples in CI) + a watchdog that dumps all thread stacks if any single
# test exceeds 10 minutes, so a hang self-diagnoses instead of spinning.
import faulthandler

import pytest as _pytest
from hypothesis import settings as _hsettings

_hsettings.register_profile("ci", derandomize=True)
_hsettings.load_profile("ci")


@_pytest.fixture(autouse=True)
def _hang_watchdog():
    faulthandler.dump_traceback_later(600, exit=False)
    yield
    faulthandler.cancel_dump_traceback_later()
