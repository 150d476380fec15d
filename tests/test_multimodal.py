from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crgp_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_fake_payload,
    extract_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    pdf = pd.DataFrame(
        {"doc_id": range(20), "text": [f"document body {i} " * (i + 1) for i in range(20)]}
    )
    return attach_fake_payload(spark.createDataFrame(pdf)).persist()


def test_payload_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    row = media.first()
    assert row.meta.format in ("png", "jpeg", "wav")
    assert row.meta.width >= 4


def test_feature_extraction_shapes(spark, media):
    feats = extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r.features) == FEATURE_DIM for r in rows)
    assert all(r.n_bytes > 0 for r in rows)
    # deterministic
    again = extract_features(media, fake=True).collect()
    assert {r.media_id: tuple(r.features) for r in rows} == {
        r.media_id: tuple(r.features) for r in again
    }


def test_real_decode_is_stubbed(spark, media):
    with pytest.raises(Exception) as ei:
        extract_features(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "not available" in str(ei.value)


def test_frame_sampling(spark, media):
    frames = sample_frames(media, every=2)
    pdf = frames.toPandas()
    assert (pdf.frame_idx % 2 == 0).all()
    n_frames = {r.media_id: r.meta.n_frames for r in media.collect()}
    got = pdf.groupby("media_id").size().to_dict()
    for mid, n in n_frames.items():
        expected = len(range(0, max(n, 1), 2))
        assert got[mid] == expected
