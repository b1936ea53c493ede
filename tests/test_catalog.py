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


def test_object_store_list_never_walks_outside_prefix_dir(tmp_path, monkeypatch):
    """Round-6 review #1: a key query whose prefix-parent doesn't exist
    must return empty WITHOUT walking any ancestor — the original
    nearest-existing-ancestor climb os.walk'ed arbitrary unrelated
    trees (worst case '/') on e.g. is_dir() of a fresh not-yet-created
    work_dir."""
    import os

    from pdfredact_spark.catalog import ObjectStoreLedgerStorage

    st = ObjectStoreLedgerStorage()
    root = str(tmp_path / "store")
    st._put(os.path.join(root, "real", "k.parquet"), b"x")

    walked: list = []
    real_walk = os.walk
    monkeypatch.setattr(
        os, "walk", lambda p, *a, **k: (walked.append(p), real_walk(p, *a, **k))[1]
    )
    assert not st.is_dir(os.path.join(root, "missing", "deep"))
    assert st.list_dirs(os.path.join(root, "missing", "batch=*")) == []
    assert not st.has_parquet(os.path.join(root, "also-missing"))
    assert walked == []  # nonexistent parent -> no walk at all
    # and a legitimate query walks exactly its own prefix dir
    assert st.is_dir(os.path.join(root, "real"))
    assert walked == [os.path.join(root, "real")]


def test_object_store_storage_semantics(tmp_path):
    """The object-store LedgerStorage backend (round-5 verdict, next #2)
    must behave like an S3-class store, not like POSIX:

    * no directory objects — an empty directory is invisible to is_dir /
      list_dirs / has_parquet even when the local FS has one;
    * list_dirs derives common prefixes from a flat key listing;
    * delete_tree is per-key — afterwards the prefix is gone even though
      the emulation's empty local dirs remain;
    * the meta flip is a conditional PUT: a stale etag raises
      ConditionFailed (the lost-update guard rename can't give)."""
    import os

    import pytest

    from pdfredact_spark.catalog import ConditionFailed, ObjectStoreLedgerStorage

    st = ObjectStoreLedgerStorage()
    root = str(tmp_path / "store")

    # empty POSIX directory != an object-store "directory"
    os.makedirs(os.path.join(root, "ledger", "batch=0"))
    assert not st.is_dir(os.path.join(root, "ledger", "batch=0"))
    assert st.list_dirs(os.path.join(root, "ledger", "batch=*")) == []

    # keys under prefixes surface as "directories" via common prefixes
    for b, f in [(0, "part-0.parquet"), (0, "_SUCCESS"), (2, "_SUCCESS")]:
        st._put(os.path.join(root, "ledger", f"batch={b}", f), b"x")
    got = st.list_dirs(os.path.join(root, "ledger", "batch=*"))
    assert got == [os.path.join(root, "ledger", "batch=0"),
                   os.path.join(root, "ledger", "batch=2")]
    assert st.is_dir(os.path.join(root, "ledger", "batch=0"))
    assert st.has_parquet(os.path.join(root, "ledger", "batch=0"))
    assert not st.has_parquet(os.path.join(root, "ledger", "batch=2"))
    assert st.is_file(os.path.join(root, "ledger", "batch=0", "_SUCCESS"))
    assert st.parquet_bytes_under([os.path.join(root, "ledger")]) == 1

    # per-key delete_tree: prefix disappears, sibling untouched
    st.delete_tree(os.path.join(root, "ledger", "batch=0"))
    assert not st.is_dir(os.path.join(root, "ledger", "batch=0"))
    assert st.list_dirs(os.path.join(root, "ledger", "batch=*")) == [
        os.path.join(root, "ledger", "batch=2")
    ]

    # conditional-PUT meta flip
    meta_key = os.path.join(root, "ledger_meta.json")
    assert st.read_json(meta_key) is None
    st.write_json_atomic(meta_key, {"gen": 0})
    assert st.read_json(meta_key) == {"gen": 0}
    etag0 = st.get_etag(meta_key)
    st.write_json_atomic(meta_key, {"gen": 1})  # re-reads the etag itself
    assert st.read_json(meta_key) == {"gen": 1}
    with pytest.raises(ConditionFailed):
        st.put_json_if(meta_key, {"gen": 99}, etag0)  # stale etag loses
    assert st.read_json(meta_key) == {"gen": 1}


def test_session_parses_local_with_max_failures(spark):
    # local[N,maxFailures] is valid Spark master syntax; get_spark must not
    # crash deriving the shuffle-partition default from it (getOrCreate
    # returns the existing session, but the parse runs first)
    from pdfredact_spark.session import get_spark

    s = get_spark(master="local[4,2]", app_name="parse-probe")
    assert s is spark
