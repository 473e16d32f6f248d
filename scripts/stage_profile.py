"""Per-stage wall-time profile of any registered query — the "measure,
don't guess" loop: run one ``queries()`` entry, parse ``ds.stats()`` and
print a stage table so a regression is attributable to a STAGE, not just a
wall number.  Usage:

    python scripts/stage_profile.py <query> [sf_dir] [num_cpus]

Works on queries returning a Dataset (stats ride the plan); pa.Table /
driver-folded results print the wall time only.
"""

from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, ".")


def parse_stats(stats: str) -> list[tuple[str, float]]:
    """(operator, wall_s) rows out of Dataset.stats() text — the per-
    operator pipeline wall from each 'Operator N <name>: ... in Xs'
    header (Sort prints 'executed in Xs')."""
    out = []
    for m in re.finditer(
        r"Operator \d+ (\S+?): .*?in ([\d.]+)(m?s)", stats
    ):
        val = float(m.group(2))
        secs = val / 1000 if m.group(3) == "ms" else val
        out.append((m.group(1), secs))
    return out


def main() -> None:
    import ray

    name = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    ncpu = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    fn = entrymod.queries()[name]
    t0 = time.monotonic()
    res = fn(sf)
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        mat = res.materialize()  # stats ride the materialized plan
        wall = time.monotonic() - t0
        print(f"{name}: {wall:.2f} s, {mat.count()} rows")
        for op, secs in parse_stats(mat.stats()):
            print(f"  {secs:8.2f} s  {op}")
    else:
        wall = time.monotonic() - t0
        print(f"{name}: {wall:.2f} s ({type(res).__name__}; driver-folded result)")
    ray.shutdown()


if __name__ == "__main__":
    main()
