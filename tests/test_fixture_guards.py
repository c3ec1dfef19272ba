"""Fixture-contract guards: assumptions the registered DuckDB oracles
make about the driver-generated parquet, asserted LOUDLY here so a
future fixture regeneration fails in this file instead of as an opaque
oracle hash mismatch.

Current contracts (see ADVICE r6): the media decode/resize oracles index
``documents.text`` character-wise (DuckDB ``len``/``[]`` are
character-based) while the operators work on UTF-8 BYTES -- identical
only while every document is ASCII; and the resize oracle's non-empty
branch plus the decode stripe sums assume non-NULL text.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.exists(os.path.join(d, "documents.parquet"))
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_documents_text_is_nonempty_ascii(sf_dir):
    """Every documents.text is non-NULL, non-empty, pure ASCII
    (char length == UTF-8 byte length).  If this ever fails, the media
    oracles in plans/multimodal.py need their byte-vs-char handling
    generalized -- fix THERE, not by weakening this guard."""
    con = duckdb.connect()
    bad_null, bad_nonascii = con.execute(
        f"""
        SELECT
          COUNT(*) FILTER (WHERE text IS NULL OR len(text) = 0),
          COUNT(*) FILTER (WHERE octet_length(encode(text)) != len(text))
        FROM read_parquet('{sf_dir}/documents.parquet')
        """
    ).fetchone()
    assert bad_null == 0, f"{sf_dir}: {bad_null} NULL/empty documents.text"
    assert bad_nonascii == 0, (
        f"{sf_dir}: {bad_nonascii} non-ASCII documents.text rows -- the "
        "character-indexed media oracles no longer match the byte-wise "
        "operators"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_embeddings_are_nonnull_fixed_dim(sf_dir):
    """The ANN/PQ stack assumes a constant embedding dimension divisible
    by m=8 and no NULL vectors."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT len(embedding) AS d, COUNT(*) AS n
        FROM read_parquet('{sf_dir}/embeddings.parquet')
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    assert len(rows) == 1, f"{sf_dir}: ragged embedding dims {rows}"
    dim = rows[0][0]
    assert dim is not None and dim % 8 == 0, f"{sf_dir}: dim={dim}"


def test_resize_oracle_empty_payload_branch(spark):
    """The q_media_resize oracle's empty-text branch equals the operator:
    a zero-length payload resizes to a zero frame whose md5 is the
    constant baked into the SQL (md5 of 256 NUL bytes)."""
    import hashlib

    from mqtt_message_pump_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b""), ("image", "fake", 0, 0, 0, 0))], MEDIA_SCHEMA
    )
    [row] = resize_images(df, width=16, height=16, fake=True).collect()
    got = hashlib.md5(bytes(row.content)).hexdigest()
    assert got == "348a9791dc41b89796ec3808b5b5262f"
    # and the SQL branch itself, evaluated by DuckDB
    con = duckdb.connect()
    [(sql_md5,)] = con.execute(
        "SELECT CASE WHEN len('') = 0 "
        "THEN '348a9791dc41b89796ec3808b5b5262f' ELSE 'x' END"
    ).fetchall()
    assert sql_md5 == got
