from __future__ import annotations

from pdfredact_spark.catalog import Catalog, _is_table_name
from pdfredact_spark.fixtures import corpus
from pdfredact_spark.pipeline import docs_to_df


def test_parquet_fallback_roundtrip(spark, tmp_path):
    cat = Catalog(spark)
    assert cat.iceberg is False  # no Iceberg jars in this sandbox
    target = str(tmp_path / "docs")
    df = docs_to_df(spark, corpus(6))
    assert not cat.exists(target)
    cat.overwrite(df, target)
    assert cat.exists(target)
    assert cat.read(target).count() == 6
    cat.append(docs_to_df(spark, corpus(4)), target)
    assert cat.read(target).count() == 10


def test_table_name_routing():
    assert _is_table_name("warehouse.docs.main")
    assert not _is_table_name("/data/docs")
    assert not _is_table_name("file:/data/docs")


def test_media_real_decode_is_stubbed():
    import pytest

    from pdfredact_spark.media import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(b"payload", fake=False)


def test_session_parses_local_with_max_failures(spark):
    # local[N,maxFailures] is valid Spark master syntax; get_spark must not
    # crash deriving the shuffle-partition default from it (getOrCreate
    # returns the existing session, but the parse runs first)
    from pdfredact_spark.session import get_spark

    s = get_spark(master="local[4,2]", app_name="parse-probe")
    assert s is spark
