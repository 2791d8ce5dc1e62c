"""Unit tests for the multimodal plumbing (decode stub contract,
binary schema, batch shapes)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import BinaryType

from engine.multimodal import FRAME_STEP, decode_image, multimodal_table
from tests.conftest import SF_DIR


def test_decode_stub_raises():
    # PIL is not installed in this environment: the decode path must be a
    # clearly-marked stub, not a silent fake.
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n")


def test_payload_is_binary(spark):
    mm = multimodal_table(spark, SF_DIR)
    assert isinstance(mm.schema["payload"].dataType, BinaryType)
    row = mm.limit(1).collect()[0]
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta_n_frames > 0


def test_frame_sample_expansion(spark):
    from engine.registry import QUERIES

    mm = multimodal_table(spark, SF_DIR)
    docs = mm.count()
    frames = QUERIES["mm_frame_sample"](spark, SF_DIR)
    n = frames.count()
    assert n > docs  # row-expanding
    # every doc's frame indices step by FRAME_STEP from 0
    one = (
        frames.filter(frames.doc_id == 0)
        .orderBy("frame_idx")
        .select("frame_idx")
        .collect()
    )
    idxs = [r.frame_idx for r in one]
    assert idxs == list(range(0, len(idxs) * FRAME_STEP, FRAME_STEP))
