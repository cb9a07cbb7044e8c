import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pdfextraction_spark.session import build_session

    s = build_session(app_name="pdfx-tests", master="local[4]",
                      shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def xs_parquet(tmp_path_factory):
    from fixtures.generate import write_transcripts_parquet

    p = tmp_path_factory.mktemp("fixtures") / "transcripts_xs.parquet"
    return write_transcripts_parquet(str(p), "xs")
