"""Perceptual-hash (aHash) image dedup."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.functions import imagecodec as ic
from ocr_engine_ray.pipelines.extract_stats import image_phash_dedup
from ocr_engine_ray.stages.multimodal import ahash_bits, synth_pattern_blob


class TestAHashBits:
    def test_reencoded_copies_collide(self):
        arr = ic.pattern_image(seed=37, w=100, h=70)
        bmp = ic.encode_bmp(arr)
        ppm = ic.encode_ppm(arr)
        a = ahash_bits(ic.decode_image(bmp)[:, :, 0])
        b = ahash_bits(ic.decode_image(ppm)[:, :, 0])
        assert a == b

    def test_distinct_images_differ(self):
        a = ahash_bits(ic.pattern_image(5, 64, 48)[:, :, 0])
        b = ahash_bits(ic.pattern_image(200, 64, 48)[:, :, 0])
        assert a != b

    def test_halves_fit_int32(self):
        rng = np.random.default_rng(4)
        for _ in range(20):
            g = rng.integers(0, 256, size=(rng.integers(8, 60), rng.integers(8, 60)))
            hi, lo = ahash_bits(g)
            assert 0 <= hi < 2**32 and 0 <= lo < 2**32

    def test_flat_image_all_zero_bits(self):
        g = np.full((40, 40), 99)
        assert ahash_bits(g) == (0, 0)  # no cell strictly exceeds the mean


@pytest.mark.usefixtures("ray_session")
class TestPhashDedupPipeline:
    def test_groups_match_naive(self, tmp_path):
        d = tmp_path / "p"
        d.mkdir()
        ids = [80, 81, 82, 83, 85, 88, 180, 181]  # image band, sum collisions
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64())}),
            str(d / "documents.parquet"),
        )
        got = image_phash_dedup(str(d)).take_all()
        # naive: hash every synthesized attachment
        sigs = {}
        for doc in ids:
            for i in range(doc % 4 + 1):
                arr = ic.decode_image(synth_pattern_blob(doc, i))
                sigs.setdefault(ahash_bits(arr[:, :, 0]), []).append((doc, i))
        want = []
        for sig, members in sigs.items():
            if len(members) < 2:
                continue
            members.sort()
            for j, (doc, i) in enumerate(members):
                want.append((doc, i, sig[0], sig[1], len(members), j == 0))
        want.sort()
        assert [tuple(r.values()) for r in got] == want
        assert want, "planted corpus must actually contain collisions"
