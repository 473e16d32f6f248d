"""SQL-checkable statistics over the derived interleaved table and the full
extraction pipeline.

Every query here has an exact ANSI-SQL twin in ``__ray_entry__.oracle_sql``:
the derivation's *counts* are arithmetic in ``doc_id`` (``spec.h32``) and the
inline char sums are length-preserving by construction (``synth``), so DuckDB
can recompute them from the raw ``documents`` table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Sum

from .. import spec
from ..sources.tables import sf_table
from ..stages.ingest import doc_size_class_batch
from ..stages.multimodal import MediaDecoder
from .extraction import extract_documents, interleaved_from_documents


def _shape_col(doc_nums: pa.Array) -> pa.Array:
    m = pc.cast(doc_nums, pa.int64()).to_numpy(zero_copy_only=False) % 100
    labels = np.empty(len(m), dtype=object)
    labels[m < 40] = spec.SHAPE_SHORT_TEXT
    labels[(m >= 40) & (m < 65)] = spec.SHAPE_HTML
    labels[(m >= 65) & (m < 80)] = spec.SHAPE_PDF
    labels[(m >= 80) & (m < 90)] = spec.SHAPE_IMAGE
    labels[(m >= 90) & (m < 94)] = spec.SHAPE_DOCX_MIX
    labels[m == 94] = spec.SHAPE_DOCX_REF
    labels[m > 94] = spec.SHAPE_GIANT_PDF
    return pa.array(labels, pa.string())


def shape_counts(sf_dir: str) -> rd.Dataset:
    """Docs per derived shape class (kind-dispatch analog, M1)."""
    ds = sf_table(sf_dir, "documents", columns=["doc_id"])

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({"shape": _shape_col(batch.column("doc_id"))})

    return ds.map_batches(f, batch_format="pyarrow").groupby("shape").aggregate(
        Count(alias_name="n_docs")
    )


def doc_nums(col) -> "np.ndarray":
    """Vectorized ``synth.make_doc_id`` inverse for a doc_id column:
    'doc-00000123' → 123 via an Arrow slice+cast (one kernel call instead
    of a per-row Python split in every map_batches over the corpus).
    The 4-char prefix is the single source of truth in synth.make_doc_id."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return (
        pc.cast(pc.utf8_slice_codeunits(col, 4, 32), pa.int64())
        .to_numpy(zero_copy_only=False)
    )


def input_span_counts(sf_dir: str) -> rd.Dataset:
    """Total *input* spans per shape over the derived interleaved table."""
    ds = interleaved_from_documents(f"{sf_dir}/documents.parquet")

    def f(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        n = pc.list_value_length(spans).cast(pa.int64())
        nums = pa.array(doc_nums(batch.column("doc_id")), pa.int64())
        return pa.table({"shape": _shape_col(nums), "n_spans": n})

    return (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby("shape")
        .aggregate(Sum("n_spans", alias_name="total_spans"), Count(alias_name="n_docs"))
    )


def extract_span_counts(sf_dir: str, **kwargs) -> rd.Dataset:
    """FULL extraction pipeline → (doc_id, n_spans).

    The end-to-end distributed correctness probe with an exact SQL oracle
    (``spec.OUT_SPAN_COUNT_SQL``): explode → actor extraction → shuffle →
    reassembly must conserve exactly the spec'd span count per document.
    """
    out = extract_documents(f"{sf_dir}/documents.parquet", **kwargs)

    def f(batch: pa.Table) -> pa.Table:
        nums = pa.array(doc_nums(batch.column("doc_id")), pa.int64())
        return pa.table(
            {"doc_id": nums, "n_spans": batch.column("n_spans").cast(pa.int64())}
        )

    return out.map_batches(f, batch_format="pyarrow")


def extract_inline_chars(sf_dir: str, **kwargs) -> rd.Dataset:
    """Extracted chars of inline-origin spans (kinds text/html_text) summed
    per shape, for the length-preserving shapes — SQL-exact."""
    out = extract_documents(f"{sf_dir}/documents.parquet", **kwargs)

    def f(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = pc.list_parent_indices(spans)
        flat = pc.list_flatten(spans)
        kinds = pc.struct_field(flat, "kind")
        texts = pc.struct_field(flat, "text")
        inline = pc.is_in(
            kinds, value_set=pa.array([spec.OUT_TEXT, spec.OUT_HTML_TEXT])
        )
        chars = pc.if_else(inline, pc.utf8_length(texts), pa.scalar(0, pa.int32())).cast(
            pa.int64()
        )
        per_doc = np.zeros(batch.num_rows, dtype=np.int64)
        np.add.at(per_doc, parent.to_numpy(zero_copy_only=False), chars.to_numpy(zero_copy_only=False))
        nums = pa.array(doc_nums(batch.column("doc_id")), pa.int64())
        return pa.table({"shape": _shape_col(nums), "inline_chars": pa.array(per_doc)})

    per_doc = out.map_batches(f, batch_format="pyarrow")

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(
                batch.column("shape"),
                value_set=pa.array(
                    [spec.SHAPE_SHORT_TEXT, spec.SHAPE_HTML, spec.SHAPE_DOCX_MIX]
                ),
            )
        )

    return (
        per_doc.map_batches(keep, batch_format="pyarrow")
        .groupby("shape")
        .aggregate(Sum("inline_chars", alias_name="total_inline_chars"), Count(alias_name="n_docs"))
    )


def size_class_counts(sf_dir: str) -> rd.Dataset:
    """Skew-control size classes (ingest stage) per class: count + weight."""
    ds = interleaved_from_documents(f"{sf_dir}/documents.parquet")
    sized = ds.map_batches(doc_size_class_batch, batch_format="pyarrow")
    return sized.groupby("size_class").aggregate(
        Count(alias_name="n_docs"), Sum("doc_weight", alias_name="total_weight")
    )


def lang_counts(sf_dir: str) -> rd.Dataset:
    """Normalized-lang distribution of the interleaved table (M6 analog)."""
    ds = interleaved_from_documents(f"{sf_dir}/documents.parquet")

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({"lang": batch.column("lang")})

    return ds.map_batches(f, batch_format="pyarrow").groupby("lang").aggregate(
        Count(alias_name="n_docs")
    )


def image_meta(sf_dir: str) -> rd.Dataset:
    """Decoded (stand-in) image metadata for the image-shape docs — the
    multimodal actor-pool stage with a SQL-reproducible oracle."""
    ds = interleaved_from_documents(f"{sf_dir}/documents.parquet")

    def image_spans(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = pc.list_parent_indices(spans)
        flat = pc.list_flatten(spans)
        kinds = pc.struct_field(flat, "kind")
        refs = pc.struct_field(flat, "media_ref")
        doc_ids = pc.take(batch.column("doc_id"), parent)
        nums = doc_nums(doc_ids)
        keep = pc.and_(
            pc.equal(kinds, spec.KIND_IMAGE_REF),
            pa.array((nums % 100 >= 80) & (nums % 100 < 90)),
        )
        return pa.table({"doc_id": doc_ids, "media_ref": refs}).filter(keep)

    spans = ds.map_batches(image_spans, batch_format="pyarrow")
    meta = spans.map_batches(
        MediaDecoder, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4), num_cpus=1
    )

    def project(batch: pa.Table) -> pa.Table:
        nums = pa.array(doc_nums(batch.column("doc_id")), pa.int64())
        return pa.table(
            {
                "doc_id": nums,
                "media_idx": batch.column("media_idx").cast(pa.int64()),
                "width": batch.column("width").cast(pa.int64()),
                "height": batch.column("height").cast(pa.int64()),
            }
        )

    return meta.map_batches(project, batch_format="pyarrow")


def audio_frame_stats(sf_dir: str) -> rd.Dataset:
    """Audio feature-framing metadata for the audio-sidecar docs (an
    independent overlay: every doc with ``doc_id % 100 < 10`` carries one
    audio attachment) — the multimodal actor-pool stage for the audio
    modality, SQL-reproducible like `image_meta`.

    The column-pruned read ships ONLY doc_id (the stand-in decode is
    arithmetic); a real deployment reads the binary payload column and
    `AudioFramer(use_fake=False)` parses it (stdlib WAV decode is live and
    tested).  Per doc: sample count, rate, and the STFT/fbank framing plan
    totals (25 ms window / 10 ms hop)."""
    from ..stages.multimodal import AudioFramer

    ds = sf_table(sf_dir, "documents", columns=["doc_id"])

    def band(batch: pa.Table) -> pa.Table:
        # doc_id % 100 < 10 (audio overlay band); doc_id >= 0 so the
        # truncated integer divide is the modulo
        m = pc.cast(batch.column("doc_id"), pa.int64())
        keep = pc.less(
            pc.subtract(m, pc.multiply(pc.divide(m, 100), 100)), pa.scalar(10)
        )
        return batch.filter(keep)

    audio_docs = ds.map_batches(band, batch_format="pyarrow")
    return audio_docs.map_batches(
        AudioFramer,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 4),
        num_cpus=1,
    ).sort("doc_id")


def video_frame_stats(sf_dir: str) -> rd.Dataset:
    """Frame-sampling metadata for the video-sidecar docs (overlay band
    ``10 <= doc_id % 100 < 20``): how many of each attachment's frames
    survive the 30 -> 4 fps decimation (`frame_sample_plan`) — the video
    analog of `audio_frame_stats`, same actor-pool shape, SQL-reproducible
    (step 7.5 is exact binary, so the twin's round_even is bit-identical
    to np.round)."""
    from ..stages.multimodal import VideoFrameSampler

    ds = sf_table(sf_dir, "documents", columns=["doc_id"])

    def band(batch: pa.Table) -> pa.Table:
        m = pc.cast(batch.column("doc_id"), pa.int64())
        r = pc.subtract(m, pc.multiply(pc.divide(m, 100), 100))
        keep = pc.and_(pc.greater_equal(r, pa.scalar(10)), pc.less(r, pa.scalar(20)))
        return batch.filter(keep)

    video_docs = ds.map_batches(band, batch_format="pyarrow")
    return video_docs.map_batches(
        VideoFrameSampler,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 4),
        num_cpus=1,
    ).sort("doc_id")


def image_thumbnail_plan(sf_dir: str) -> rd.Dataset:
    """Resize plan for every decoded image (the image-resize stage of the
    multimodal layer): target dims at max side 256, aspect preserved —
    `thumbnail_dims` arithmetic over the `image_meta` actor-pool output,
    SQL-reproducible (Python round is banker's == DuckDB round_even; the
    int*256/int divide is the same single IEEE operation on both sides)."""
    from ..stages.multimodal import thumbnail_dims

    meta = image_meta(sf_dir)

    def plan(batch: pa.Table) -> pa.Table:
        w = batch.column("width").combine_chunks().to_numpy(zero_copy_only=False)
        h = batch.column("height").combine_chunks().to_numpy(zero_copy_only=False)
        dims = [thumbnail_dims(int(a), int(b)) for a, b in zip(w, h)]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "media_idx": batch.column("media_idx"),
                "width": batch.column("width"),
                "height": batch.column("height"),
                "thumb_w": pa.array([d[0] for d in dims], pa.int64()),
                "thumb_h": pa.array([d[1] for d in dims], pa.int64()),
            }
        )

    return meta.map_batches(plan, batch_format="pyarrow")


def image_decode_stats(sf_dir: str) -> rd.Dataset:
    """REAL image decode over the image-band docs (``80 <= doc_id % 100 <
    90``, 1-4 attachments each): synthesize deterministic BMP/PPM/PGM bytes
    per attachment (`stages.multimodal.synth_pattern_blob` — real encoders,
    pattern pixels), then decode them for real in the `ImagePixelDecoder`
    actor pool (stdlib/numpy codecs, zero dependencies) and report
    dimensions + the wrapped-diagonal pixel sum.

    Unlike `image_meta` (metadata arithmetic), the bytes here round-trip
    through genuine image containers — a padding, channel-order, or row-order
    bug in either codec shifts ``diag_sum`` and fails the SQL twin, which
    recomputes the pattern arithmetic wholesale.  At real scale the synth
    stage is replaced by reading the binary payload column; the decode stage
    is unchanged.
    """
    from ..stages.multimodal import ImagePixelDecoder, synth_pattern_blob

    ds = sf_table(sf_dir, "documents", columns=["doc_id"])

    def band_and_synth(batch: pa.Table) -> pa.Table:
        nums = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        ids, idxs, blobs = [], [], []
        for d in nums:
            d = int(d)
            if not (80 <= d % 100 < 90):
                continue
            for i in range(d % 4 + 1):
                ids.append(d)
                idxs.append(i)
                blobs.append(synth_pattern_blob(d, i))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "media_idx": pa.array(idxs, pa.int64()),
                "image_blob": pa.array(blobs, pa.binary()),
            }
        )

    imgs = ds.map_batches(band_and_synth, batch_format="pyarrow")
    return imgs.map_batches(
        ImagePixelDecoder,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
        num_cpus=1,
    ).sort(["doc_id", "media_idx"])


def image_phash_dedup(sf_dir: str, *, num_buckets: int = 32) -> rd.Dataset:
    """Perceptual near-dup groups over the image-band attachments: REAL
    decode (stdlib BMP/PPM/PGM codecs) → 64-bit average hash (`aHash`) →
    exact hash-equality groups.  Re-encoded copies of the same pixels
    (the pattern corpus plants them: ``doc_id + media_idx`` collisions
    yield identical images across documents) collide on pixels where
    byte-level dedup would miss them.

    Scale shape: the decode+hash actor pool maps the binary payloads
    once; signatures (two int32 halves per image) ride ONE hash-bucket
    shuffle; groups of ≥2 are marked with their canonical (min doc_id,
    media_idx) member.  Returns (doc_id, media_idx, ahash_hi, ahash_lo,
    group_n, is_canonical) sorted by (doc_id, media_idx); the SQL twin
    recomputes the pattern pixels, the 8×8 integer cell partition and
    the cross-multiplied mean compare wholesale.
    """
    from ..stages.multimodal import ImageAHasher, synth_pattern_blob

    ds = sf_table(sf_dir, "documents", columns=["doc_id"])

    def band_and_synth(batch: pa.Table) -> pa.Table:
        nums = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        ids, idxs, blobs = [], [], []
        for d in nums:
            d = int(d)
            if not (80 <= d % 100 < 90):
                continue
            for i in range(d % 4 + 1):
                ids.append(d)
                idxs.append(i)
                blobs.append(synth_pattern_blob(d, i))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "media_idx": pa.array(idxs, pa.int64()),
                "image_blob": pa.array(blobs, pa.binary()),
            }
        )

    hashed = (
        ds.map_batches(band_and_synth, batch_format="pyarrow")
        .map_batches(
            ImageAHasher,
            batch_format="pyarrow",
            batch_size=256,
            concurrency=(1, 4),
            num_cpus=1,
        )
    )

    def hbkt(batch: pa.Table) -> pa.Table:
        hi = batch.column("ahash_hi").combine_chunks().to_numpy(zero_copy_only=False)
        lo = batch.column("ahash_lo").combine_chunks().to_numpy(zero_copy_only=False)
        b = ((hi * np.int64(1_000_003) + lo) % num_buckets).astype(np.int64)
        return batch.append_column("_hbkt", pa.array(b))

    def groups(group: pa.Table) -> pa.Table:
        df = group.select(
            ["doc_id", "media_idx", "ahash_hi", "ahash_lo"]
        ).to_pandas()
        g = df.groupby(["ahash_hi", "ahash_lo"], sort=False)
        df["group_n"] = g["doc_id"].transform("size").astype("int64")
        df = df[df["group_n"] >= 2]
        if len(df):
            first = (
                df.sort_values(["doc_id", "media_idx"], kind="mergesort")
                .groupby(["ahash_hi", "ahash_lo"], sort=False)
                .head(1)
                .index
            )
            df["is_canonical"] = df.index.isin(first)
        else:
            df = df.assign(is_canonical=pa.array([], pa.bool_()).to_pandas())
        return pa.Table.from_pandas(
            df[["doc_id", "media_idx", "ahash_hi", "ahash_lo", "group_n", "is_canonical"]],
            preserve_index=False,
        )

    return (
        hashed.map_batches(hbkt, batch_format="pyarrow")
        .groupby("_hbkt")
        .map_groups(groups, batch_format="pyarrow")
        .sort(["doc_id", "media_idx"])
    )


def audio_fingerprint_dedup(sf_dir: str, *, num_buckets: int = 32) -> rd.Dataset:
    """Audio near-dup groups over the audio-band attachments
    (``doc_id % 100 < 10``): REAL WAV synth → REAL stdlib decode →
    energy-contour fingerprint (32 sign-of-delta bits over the opening
    second) → exact fingerprint-equality groups.  Truncated copies of the
    same recording collide (only the opening is hashed); byte-level
    dedup would miss them because lengths differ.

    Scale shape mirrors `image_phash_dedup`: decode+hash actor pool over
    the payloads, one fp-bucket shuffle for the groups.  Returns
    (doc_id, fp, group_n, is_canonical) sorted by doc_id; the SQL twin
    recomputes the modular-ramp samples, the 33 overlapping |·|-sum
    windows and the delta bits wholesale.
    """
    from ..stages.multimodal import AudioFingerprinter, synth_wav_blob

    ds = sf_table(sf_dir, "documents", columns=["doc_id"])

    def band_and_synth(batch: pa.Table) -> pa.Table:
        nums = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        ids, blobs = [], []
        for d in nums:
            d = int(d)
            if d % 100 < 10:
                ids.append(d)
                blobs.append(synth_wav_blob(d))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "media_blob": pa.array(blobs, pa.binary()),
            }
        )

    hashed = (
        ds.map_batches(band_and_synth, batch_format="pyarrow")
        .map_batches(
            AudioFingerprinter,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=(1, 4),
            num_cpus=1,
        )
        .filter(expr="fp_ok == True")
    )

    def fbkt(batch: pa.Table) -> pa.Table:
        fp = batch.column("fp").combine_chunks().to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_fbkt", pa.array((fp % num_buckets).astype(np.int64))
        )

    def groups(group: pa.Table) -> pa.Table:
        df = group.select(["doc_id", "fp"]).to_pandas()
        g = df.groupby("fp", sort=False)
        df["group_n"] = g["doc_id"].transform("size").astype("int64")
        df = df[df["group_n"] >= 2]
        if len(df):
            first = (
                df.sort_values("doc_id", kind="mergesort")
                .groupby("fp", sort=False)
                .head(1)
                .index
            )
            df["is_canonical"] = df.index.isin(first)
        else:
            df = df.assign(is_canonical=pa.array([], pa.bool_()).to_pandas())
        return pa.Table.from_pandas(
            df[["doc_id", "fp", "group_n", "is_canonical"]], preserve_index=False
        )

    return (
        hashed.map_batches(fbkt, batch_format="pyarrow")
        .groupby("_fbkt")
        .map_groups(groups, batch_format="pyarrow")
        .sort("doc_id")
    )


VIDEO_SCENE_SALT = 901
VIDEO_SCENE_THRESHOLD = 128


def video_scene_cuts(sf_dir: str) -> rd.Dataset:
    """Scene-cut detection plan for the video-band attachments
    (``10 <= doc_id % 100 < 20``): per video, adjacent-frame signature
    deltas above the threshold mark cuts — the shot-segmentation stage
    of a video curation pipeline (cut density drives clip sampling).
    Frame signatures are the deterministic h32 stand-in (the sandbox
    ships no video codec); a real deployment swaps in per-frame pixel
    hashes from the decoder, and the delta/threshold stage is unchanged
    — the same stand-in seam as `video_frame_stats`.

    Vectorized per batch (uint64 wrap-around IS the mod-2^32 h32
    arithmetic: 2^32 divides 2^64); shuffle-free.  Returns (doc_id,
    n_frames, n_cuts, first_cut) with first_cut = −1 when no cut,
    sorted by doc_id; lag-window twin over generated frame series.
    """
    from ..stages.multimodal import fake_video_frames

    ds = sf_table(sf_dir, "documents", columns=["doc_id"])
    K = np.uint64(2654435761)
    M32 = np.uint64(4294967296)

    def cuts(batch: pa.Table) -> pa.Table:
        nums = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        out = {"doc_id": [], "n_frames": [], "n_cuts": [], "first_cut": []}
        for d in nums:
            d = int(d)
            if not (10 <= d % 100 < 20):
                continue
            nf = fake_video_frames(d)
            f = np.arange(nf, dtype=np.uint64)
            sig = (
                ((np.uint64(d * 1024) + f + np.uint64(VIDEO_SCENE_SALT)) * K) % M32
            ) % np.uint64(256)
            dl = np.abs(sig[1:].astype(np.int64) - sig[:-1].astype(np.int64))
            cut = dl > VIDEO_SCENE_THRESHOLD
            out["doc_id"].append(d)
            out["n_frames"].append(nf)
            out["n_cuts"].append(int(cut.sum()))
            out["first_cut"].append(int(np.argmax(cut)) + 1 if cut.any() else -1)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "n_frames": pa.array(out["n_frames"], pa.int64()),
                "n_cuts": pa.array(out["n_cuts"], pa.int64()),
                "first_cut": pa.array(out["first_cut"], pa.int64()),
            }
        )

    return ds.map_batches(cuts, batch_format="pyarrow").sort("doc_id")


DELTA_MOD = 50
DELTA_RESIDUE = 7
_DELTA_NOTE = "rev2 appended notice"


def _mutate_interleaved(batch: pa.Table) -> pa.Table:
    """v2 overlay: docs with ``doc_num % DELTA_MOD == DELTA_RESIDUE`` gain
    one trailing text span (offset 10^9 sorts it last).  Only the mutated
    ~2% pay the python span rebuild; the rest pass through zero-copy."""
    from .. import synth

    ids = batch.column("doc_id").to_pylist()
    nums = np.array([synth.doc_num_from_id(d) for d in ids], dtype=np.int64)
    hit = (nums % DELTA_MOD) == DELTA_RESIDUE
    if not hit.any():
        return batch
    keep = batch.filter(pa.array(~hit))
    mut = batch.filter(pa.array(hit))
    rows = mut.to_pylist()
    for r in rows:
        r["spans"] = list(r["spans"]) + [
            {
                "kind": spec.KIND_TEXT,
                "text": _DELTA_NOTE,
                "media_ref": "",
                "offset": 1_000_000_000,
            }
        ]
    mut2 = pa.Table.from_pylist(rows, schema=batch.schema)
    return pa.concat_tables([keep, mut2])


def extraction_delta(sf_dir: str, *, num_buckets: int = 32, **kwargs) -> pa.Table:
    """Incremental re-extraction delta — the CDC view of the extraction
    engine the north rule's resumability story implies: given corpus v2
    (a deterministic ~2% overlay on v1), which documents' EXTRACTED
    span sequences changed?  At production scale this is the audit that
    decides how much of a re-crawl actually needs re-processing
    downstream (embedding, dedup, indexing are all keyed on extracted
    content, not raw bytes).

    Scale shape: both versions stream through the normal extraction
    pipeline; a per-doc md5 over the framed (kind, text, media_ref,
    order) sequence reduces each version to corpus-count 16-byte rows;
    ONE doc-keyed bucket shuffle pairs the two hashes and folds
    (n_total, n_changed, changed-id digest) partials.  Returns one row
    (n_docs, n_changed, digest) — pinned from the sequential oracle
    (`oracle_dedup.extraction_delta_oracle`), which re-extracts both
    versions with the independent `ocr_engine_ray.oracle` extractor.
    """
    import hashlib
    import zlib

    from .interpret import DIGEST_MOD, row_digest
    from .extraction import extract_from_interleaved

    base = interleaved_from_documents(f"{sf_dir}/documents.parquet")
    v2 = interleaved_from_documents(f"{sf_dir}/documents.parquet").map_batches(
        _mutate_interleaved, batch_format="pyarrow"
    )

    def span_hash(tag: int):
        def inner(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            spans = batch.column("spans").to_pylist()
            hs, bks = [], []
            for d, ss in zip(ids, spans):
                framed = "\x1e".join(
                    f"{s['kind']}\x1f{s['text']}\x1f{s['media_ref']}\x1f{s['order']}"
                    for s in (ss or [])
                )
                h = hashlib.md5(framed.encode("utf-8")).digest()
                hs.append(int.from_bytes(h[:8], "big") // 2)  # int64-safe
                bks.append(zlib.crc32(d.encode()) % num_buckets)
            return pa.table(
                {
                    "bkt": pa.array(bks, pa.int64()),
                    "doc_id": pa.array(ids, pa.string()),
                    "h": pa.array(hs, pa.int64()),
                    "tag": pa.array(np.full(len(ids), tag, dtype=np.int64)),
                }
            )

        return inner

    h1 = extract_from_interleaved(base, **kwargs).map_batches(
        span_hash(0), batch_format="pyarrow"
    )
    h2 = extract_from_interleaved(v2, **kwargs).map_batches(
        span_hash(1), batch_format="pyarrow"
    )

    def diff(group: pa.Table) -> pa.Table:
        ids = np.array(group.column("doc_id").to_pylist(), dtype=object)
        h = group.column("h").combine_chunks().to_numpy(zero_copy_only=False)
        tag = group.column("tag").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((tag, ids))
        ids, h, tag = ids[order], h[order], tag[order]
        # rows arrive as (doc, tag 0), (doc, tag 1) pairs after the sort
        changed = h[tag == 0] != h[tag == 1]
        cids = ids[tag == 0][changed]
        dg = 0
        for d in cids.tolist():
            dg = (dg + row_digest(str(d), "changed")) % DIGEST_MOD
        return pa.table(
            {
                "n": pa.array([int((tag == 0).sum())], pa.int64()),
                "nc": pa.array([int(changed.sum())], pa.int64()),
                "dg": pa.array([dg], pa.int64()),
            }
        )

    parts = (
        h1.union(h2).groupby("bkt").map_groups(diff, batch_format="pyarrow").take_all()
    )
    n = sum(r["n"] for r in parts)
    nc = sum(r["nc"] for r in parts)
    dg = sum(r["dg"] for r in parts) % DIGEST_MOD
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "n_changed": pa.array([nc], pa.int64()),
            "digest": pa.array([dg], pa.int64()),
        }
    )
