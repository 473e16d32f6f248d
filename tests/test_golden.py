"""Golden-hash drift guard (SURVEY.md §5.4).

The oracle and the pipeline are verified against each other at runtime, but
that equality is blind to *consistent co-drift* — a change to ``synth`` or
``oracle`` that silently alters the spec on both sides at once.  These
hashes, generated once from the seed-42 unit fixture and committed, pin the
actual byte-level semantics.

If a test here fails after an INTENTIONAL spec change, regenerate with::

    python - <<'PY'
    import json, hashlib, sys; sys.path.insert(0, 'tests')
    from fixtures import unit_docs
    from ocr_engine_ray import oracle
    g = {}
    for doc in unit_docs():
        out = oracle.extract_document(doc)
        canon = json.dumps([(s['kind'], s['text'], s['media_ref'], s['order'])
                            for s in out['spans']] + [out['fields_json']],
                           ensure_ascii=False)
        g[doc['doc_id']] = hashlib.md5(canon.encode()).hexdigest()
    json.dump(g, open('tests/golden_hashes.json', 'w'), indent=1, sort_keys=True)
    PY
"""

from __future__ import annotations

import hashlib
import json
import pathlib

from ocr_engine_ray import oracle

from .fixtures import unit_docs

GOLDEN_PATH = pathlib.Path(__file__).parent / "golden_hashes.json"


def _hash_doc(doc: dict) -> str:
    out = oracle.extract_document(doc)
    canon = json.dumps(
        [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in out["spans"]]
        + [out["fields_json"]],
        ensure_ascii=False,
    )
    return hashlib.md5(canon.encode("utf-8")).hexdigest()


class TestGoldenHashes:
    def test_oracle_matches_committed_goldens(self):
        goldens = json.loads(GOLDEN_PATH.read_text())
        docs = unit_docs()
        assert len(docs) == len(goldens)
        mismatches = [
            d["doc_id"] for d in docs if _hash_doc(d) != goldens[d["doc_id"]]
        ]
        assert not mismatches, (
            f"oracle/synth semantics drifted for {mismatches[:5]} "
            "(regenerate goldens ONLY for an intentional spec change)"
        )
