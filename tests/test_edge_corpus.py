"""Edge-document behavior the synthetic testdata can't exercise: empty
text, whitespace-only text, and single-word docs must neither crash the
curation queries nor silently vanish from per-doc verdicts — checked
against the same DuckDB oracles over the same parquet.
"""

from __future__ import annotations

import duckdb
import pytest

from pdfredact_spark.queries import ORACLE_SQL, SQL_QUERIES

DOCS = [
    (0, "", "en", "src0", 0),
    (1, "   ", "en", "src0", 3),
    (2, "word", "en", "src1", 4),
    (3, "a a a a a a", "en", "src1", 11),
    (4, "the quick brown fox jumps over the lazy dog again", "en", "src2", 50),
    (5, "the quick brown fox jumps over the lazy dog again", "en", "src2", 50),
]
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge")
    spark.createDataFrame(DOCS, SCHEMA).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def _oracle(edge_dir, name):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{edge_dir}/documents.parquet/*.parquet')"
    )
    return con.execute(ORACLE_SQL[name]).df()


@pytest.mark.parametrize(
    "name", ["chunk_documents", "repetition_filter", "decontaminate_ngram_overlap",
             "curate_corpus", "token_count", "doc_fingerprint",
             "text_quality", "lang_id", "rolling_fingerprint",
             "simhash_fingerprint"]
)
def test_edge_docs_match_oracle(name, spark, edge_dir):
    sdf = (
        SQL_QUERIES[name](spark, edge_dir)
        .toPandas()
        .sort_values(["doc_id"] if name != "chunk_documents" else ["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    odf = (
        _oracle(edge_dir, name)
        .sort_values(["doc_id"] if name != "chunk_documents" else ["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    assert len(sdf) == len(odf), name
    assert sdf[sorted(sdf.columns)].equals(odf[sorted(odf.columns)]), name


def test_curate_covers_every_doc(spark, edge_dir):
    """Per-doc verdict completeness: even empty / word-less docs get a
    row (the repetition join is LEFT with a vacuous pass)."""
    sdf = SQL_QUERIES["curate_corpus"](spark, edge_dir).toPandas()
    assert sorted(sdf["doc_id"]) == [d[0] for d in DOCS]
    by_id = sdf.set_index("doc_id")
    assert by_id.loc[0, "pass_repetition"] == 1  # empty text: vacuous pass
    assert by_id.loc[3, "pass_repetition"] == 0  # 'a a a a a a': all repeats
    # exact duplicate pair: min doc_id survives
    assert by_id.loc[4, "pass_dedup"] == 1
    assert by_id.loc[5, "pass_dedup"] == 0


def test_chunking_drops_only_empty_docs(spark, edge_dir):
    sdf = SQL_QUERIES["chunk_documents"](spark, edge_dir).toPandas()
    assert 0 not in set(sdf["doc_id"])  # len-0 doc yields no chunks
    assert set(sdf["doc_id"]) == {1, 2, 3, 4, 5}  # everything else chunks
