"""Audio energy-contour fingerprint dedup."""

from __future__ import annotations

import io
import wave

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.extract_stats import audio_fingerprint_dedup
from ocr_engine_ray.stages.multimodal import (
    AUDIO_FP_SEED_SALT,
    AudioFingerprinter,
    synth_wav_blob,
)
from ocr_engine_ray import spec


def _fp_of(blob: bytes) -> tuple[int, bool]:
    t = AudioFingerprinter()(
        pa.table(
            {"doc_id": pa.array([0], pa.int64()), "media_blob": pa.array([blob])}
        )
    )
    return t.column("fp")[0].as_py(), t.column("fp_ok")[0].as_py()


class TestFingerprint:
    def test_truncated_copy_collides(self):
        # same seed, different length -> same opening -> same fp
        a = synth_wav_blob(100)  # doc 100
        seed = spec.h32(100, AUDIO_FP_SEED_SALT) % 256
        t = np.arange(6000, dtype=np.int64)
        samples = ((seed + 7 * t) % 65536 - 32768).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(samples.tobytes())
        fa, oka = _fp_of(a)
        fb, okb = _fp_of(buf.getvalue())
        assert oka and okb and fa == fb

    def test_short_clip_flagged(self):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(np.zeros(100, np.int16).tobytes())
        _, ok = _fp_of(buf.getvalue())
        assert not ok


@pytest.mark.usefixtures("ray_session")
class TestAudioDedupPipeline:
    def test_groups_match_naive(self, tmp_path):
        d = tmp_path / "a"
        d.mkdir()
        ids = [0, 1, 2, 5, 100, 101, 105, 200, 305, 400]  # audio band only
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64())}),
            str(d / "documents.parquet"),
        )
        got = audio_fingerprint_dedup(str(d)).take_all()
        sigs = {}
        for doc in ids:
            fp, ok = _fp_of(synth_wav_blob(doc))
            assert ok
            sigs.setdefault(fp, []).append(doc)
        want = []
        for fp, members in sigs.items():
            if len(members) < 2:
                continue
            members.sort()
            for j, doc in enumerate(members):
                want.append((doc, fp, len(members), j == 0))
        want.sort()
        assert [tuple(r.values()) for r in got] == want
        assert want, "seed space must plant collisions"
