"""Chunking and packing invariants: lossless coverage with exact
overlap, and the sequential-fill packing contract."""

import pytest

from etl_database_spark.functions.chunking import chunk_documents, pack_documents


@pytest.fixture(scope="module")
def docs(spark):
    texts = [
        "a" * 5,                      # shorter than one chunk
        "".join(chr(97 + i % 26) for i in range(100)),   # several chunks
        "".join(chr(65 + i % 26) for i in range(41)),    # remainder chunk
        "x" * 40,                     # exactly chunk_size
    ]
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_chunks_reconstruct_document(spark, docs):
    size, overlap = 40, 10
    stride = size - overlap
    originals = {r.doc_id: r.text for r in docs.collect()}
    chunks = chunk_documents(docs, size, overlap).orderBy("doc_id", "chunk_idx").collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in by_doc.items():
        assert [r.chunk_idx for r in rows] == list(range(len(rows)))
        rebuilt = rows[0].chunk_text + "".join(r.chunk_text[overlap:] for r in rows[1:])
        assert rebuilt == originals[doc_id]
        # consecutive chunks agree on the overlap region
        for a, b in zip(rows, rows[1:]):
            assert a.chunk_text[stride:] == b.chunk_text[: len(a.chunk_text) - stride]


def test_chunk_empty_doc_dropped_and_bad_overlap_rejected(spark):
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    assert chunk_documents(df, 40, 10).count() == 0
    with pytest.raises(ValueError):
        chunk_documents(df, 40, 40)


def test_packing_sequential_fill_contract(spark):
    rows = [(i, 30 + (i * 7) % 50) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    budget = 200
    packed = pack_documents(df, budget, n_shards=4).collect()
    assert len(packed) == 300  # every doc assigned exactly once

    tokens = dict(rows)
    by_shard: dict[int, list] = {}
    for r in sorted(packed, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    for shard, srows in by_shard.items():
        bins = [r.bin_id for r in srows]
        # bins are non-decreasing in id order and start at 0
        assert bins[0] == 0 and all(a <= b for a, b in zip(bins, bins[1:]))
        # sequential-fill: a bin's token total overflows the budget by
        # at most its last document
        totals: dict[int, list] = {}
        for r in srows:
            totals.setdefault(r.bin_id, []).append(tokens[r.doc_id])
        for b, ts in totals.items():
            assert sum(ts) - ts[-1] < budget


def test_pack_documents_duplicate_ids_keep_rows_frame(spark):
    """Duplicate ids must not become RANGE-frame peers: with the
    default RANGE frame, three 150-token docs sharing an id would all
    see the full 450 cumsum and land in bin 1 (bin 0 empty, bin 1
    overfilled by two docs); the ROWS frame fills sequentially —
    starts 0/150/300 → bins 0/0/1, never more than one doc of
    overflow per bin."""
    from etl_database_spark.functions.chunking import pack_documents

    df = spark.createDataFrame(
        [(1, 150), (1, 150), (1, 150)], "doc_id long, n_tokens long"
    )
    bins = sorted(
        r.bin_id for r in pack_documents(df, budget=200, n_shards=1).collect()
    )
    assert bins == [0, 0, 1]
