import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:  # deterministic property tests: the driver's gate must not flake
    from hypothesis import settings

    settings.register_profile("ci", derandomize=True, deadline=None)
    settings.load_profile("ci")
except ImportError:
    pass


@pytest.fixture(scope="session")
def spark():
    from ddsketchy_spark.spark.session import get_spark

    s = get_spark("ddsketchy-tests", master="local[4]", shuffle_partitions=4,
                  arrow_batch_rows=8192)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def token_table_path(tmp_path_factory):
    from ddsketchy_spark.data.synth import write_token_table

    path = str(tmp_path_factory.mktemp("tokens") / "tokens_20k")
    write_token_table(path, n_rows=20_000, seed=42, rows_per_file=5_000)
    return path


@pytest.fixture(scope="session")
def sf001_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf01_dir():
    return "/root/testdata/sf0.01"
