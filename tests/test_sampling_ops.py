

def test_chunk_documents_sliding_windows(spark):
    from beats_spark.operators.sampling import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 toks
            (2, "a b c"),                               # fits one chunk
            (3, "   "),                                 # blank: no chunks
            (4, None),                                  # NULL: no chunks
            (5, "x  y\n z"),                            # whitespace runs
            (6, "hello world\n"),                       # trailing newline
            (7, "\n\t "),                               # ws-only: no chunks
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap_tokens=1)
    rows = {(r.doc_id, r.chunk_idx): r for r in out.collect()}
    # doc 1: step=3, last start = max(10-1-1,0)=8 -> starts 0,3,6 (9>8? seq to 8 step 3 = 0,3,6)
    d1 = sorted(k[1] for k in rows if k[0] == 1)
    assert d1 == [0, 1, 2]
    assert rows[(1, 0)].chunk_text == "t0 t1 t2 t3"
    assert rows[(1, 1)].chunk_text == "t3 t4 t5 t6"  # 1-token overlap
    assert rows[(1, 2)].chunk_text == "t6 t7 t8 t9"
    assert rows[(1, 2)].chunk_len == 4 and rows[(1, 2)].chunk_start == 6
    assert rows[(2, 0)].chunk_text == "a b c" and rows[(2, 0)].chunk_len == 3
    assert not any(k[0] in (3, 4, 7) for k in rows)
    assert rows[(5, 0)].chunk_text == "x y z"  # runs normalize
    # edge whitespace beyond spaces: no phantom empty tokens
    assert rows[(6, 0)].chunk_text == "hello world"
    assert rows[(6, 0)].chunk_len == 2
    # every token covered exactly: union of [start, start+len) == [0, n)
    for d, n in ((1, 10), (2, 3), (5, 3)):
        covered = set()
        for (doc, _), r in rows.items():
            if doc == d:
                covered |= set(range(r.chunk_start, r.chunk_start + r.chunk_len))
        assert covered == set(range(n))


def test_chunk_documents_zero_shuffle(spark):
    from beats_spark.operators.sampling import chunk_documents
    from tests.test_plan_shapes import plan_of

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert "Exchange" not in plan_of(chunk_documents(docs))


def test_chunk_documents_bad_params(spark):
    import pytest

    from beats_spark.operators.sampling import chunk_documents

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    for ct, ot in ((0, 0), (4, 4), (4, -1)):
        with pytest.raises(ValueError):
            chunk_documents(docs, chunk_tokens=ct, overlap_tokens=ot)
