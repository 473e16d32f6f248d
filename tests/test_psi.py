"""Population Stability Index between stream halves."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.analytics import psi_value_drift

T0 = dt.datetime(2024, 6, 1)


def _write_events(d, rows):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "value": pa.array([float(r[1]) for r in rows]),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestPSI:
    def test_identical_halves_near_zero(self, tmp_path):
        rows = []
        for h in range(2):
            base = T0 + dt.timedelta(days=h)
            for i in range(200):
                rows.append((base + dt.timedelta(seconds=i), 1.0 + (i % 10)))
        sf = _write_events(tmp_path / "same", rows)
        r = psi_value_drift(sf).take_all()[0]
        assert r["n_h1"] == 200 and r["n_h2"] == 200
        # identical distributions: PSI ~ 0 (exactly 0 here — equal counts)
        assert abs(r["psi_q40"] / (1 << 40)) < 1e-9

    def test_shifted_half_scores_high(self, tmp_path):
        rows = []
        for i in range(300):
            rows.append((T0 + dt.timedelta(seconds=i), 1.0))       # H1: all low
        for i in range(300):
            rows.append((T0 + dt.timedelta(days=2, seconds=i), 100.0))  # H2: high
        sf = _write_events(tmp_path / "shift", rows)
        r = psi_value_drift(sf).take_all()[0]
        psi = r["psi_q40"] / (1 << 40)
        assert psi > 0.25  # the canonical "shifted" threshold

    def test_matches_plain_numpy_recompute(self, tmp_path):
        rng = np.random.default_rng(8)
        rows = []
        for i in range(400):
            day = 0 if i < 200 else 3
            rows.append(
                (T0 + dt.timedelta(days=day, seconds=i), float(rng.uniform(1, 50)))
            )
        sf = _write_events(tmp_path / "n", rows)
        r = psi_value_drift(sf).take_all()[0]
        # independent recompute
        cents = np.array([round(v * 100) for _, v in rows], dtype=np.int64)
        ts = np.array(
            [int(t.timestamp() * 1e6) for t, _ in rows], dtype=np.int64
        )
        tmid = (ts.min() + ts.max()) // 2
        cmin, rng1 = cents.min(), cents.max() - cents.min() + 1
        bkt = (cents - cmin) * 20 // rng1
        n1 = np.bincount(bkt[ts <= tmid], minlength=20)
        n2 = np.bincount(bkt[ts > tmid], minlength=20)
        N1, N2 = n1.sum(), n2.sum()
        psi_q = 0
        for b in range(20):
            p = float(n1[b] + 1) / float(N1 + 20)
            q = float(n2[b] + 1) / float(N2 + 20)
            psi_q += int(np.round((p - q) * np.log(p / q) * float(1 << 40)))
        assert r["psi_q40"] == psi_q
