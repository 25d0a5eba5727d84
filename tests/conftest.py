import logging

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
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_fixture():
    from biomedical_ner_ray.fixtures import ensure_fixture

    return ensure_fixture("sf0.001")


@pytest.fixture(scope="session")
def alias_rows_fx():
    from biomedical_ner_ray.fixtures import alias_rows

    return alias_rows()


def pytest_runtest_logreport(report):
    # print failures IMMEDIATELY: session teardown can hang (ray.shutdown
    # with wedged workers), which would otherwise swallow the report
    if report.failed and report.when == "call":
        print(f"\n=== FAILED-NOW {report.nodeid} ===", flush=True)
        try:
            print(report.longreprtext[:4000], flush=True)
        except Exception:
            pass
