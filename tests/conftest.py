import sys

import pytest

sys.path.insert(0, "/root/repo")

from migrate_blob_data_from_rdbms_to_amazon_s3_spark import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="engine-tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
