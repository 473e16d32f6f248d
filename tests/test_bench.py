"""bench.py smoke: the driver's per-round benchmark must always produce one
valid JSON line (run in a subprocess — bench owns its own Ray session)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestBenchSmoke:
    def test_bench_json_line(self):
        env = dict(
            os.environ,
            GRAFT_SF_DIR="/root/testdata/sf0.001",
            RAY_GRAFT_CPUS="4",
            BENCH_REPLICATE="1",
            BENCH_SKIP_QUERIES="1",
        )
        out = subprocess.run(
            [sys.executable, "bench.py"],
            env=env,
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=300,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        line = out.stdout.strip().splitlines()[-1]
        payload = json.loads(line)
        assert payload["metric"] == "extraction_wall_sec"
        assert payload["unit"] == "sec"
        assert payload["value"] > 0
        assert payload["docs"] == 500
        assert payload["num_cpus"] == 4
        assert "docs_per_sec" in payload and "queries" in payload
