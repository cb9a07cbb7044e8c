"""Multimodal plumbing tests: schema, mapInPandas batch shapes,
deterministic stub decode, frame-sample explode."""

import pytest

from pdfextraction_spark.functions import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    df = M.gen_media_fixture(spark, n_items=60)
    df.cache().count()
    return df


@pytest.mark.slow
class TestMultimodal:
    def test_schema_roundtrip(self, spark, media, tmp_path):
        p = str(tmp_path / "media.parquet")
        media.write.parquet(p)
        back = spark.read.parquet(p)
        assert back.schema == M.MEDIA_SCHEMA
        assert back.count() == 60

    def test_image_features_deterministic(self, media):
        a = M.image_features(media, num_partitions=4).orderBy("media_id").collect()
        b = M.image_features(media, num_partitions=8).orderBy("media_id").collect()
        assert len(a) == 20  # every 3rd item is an image
        assert [r.phash for r in a] == [r.phash for r in b]
        assert all(0 <= r.mean_byte <= 255 for r in a)

    def test_resize_plan(self, media):
        out = M.resize_images(media, max_side=256).collect()
        for r in out:
            assert max(r.new_width, r.new_height) <= 256
            assert min(r.new_width, r.new_height) >= 1

    def test_frame_sampling_counts(self, media):
        out = M.sample_frames(media, every_k=10).toPandas()
        metas = {r.media_id: r.meta.n_frames
                 for r in media.filter("kind = 'video'").collect()}
        counts = out.groupby("media_id").size().to_dict()
        for mid, n_frames in metas.items():
            assert counts[mid] == (n_frames + 9) // 10
        # digests unique per (media, frame)
        assert not out.duplicated(["media_id", "frame_idx"]).any()
        assert out["frame_digest"].nunique() == len(out)

    def test_real_decoder_is_marked_stub(self):
        with pytest.raises(NotImplementedError, match="PIL"):
            M.decode_image_real(b"\x89PNG")
