#!/usr/bin/env python
"""Generate data/seeds.parquet from the reference's seed corpus.

The reference ships ~116 URL → description seed pairs as a Go map literal
(``PublicGeospatialDataSeeds``, ``internal/crawler/data.go:110-474``). This
script parses that file and writes the list as a parquet table with the
schema the engine's ``seeds_df`` contract uses::

    seed_order: int32, url: string, description: string

``seed_order`` is the order of appearance in the source file — Go map
iteration is nondeterministic, so source order is the only reproducible
total order to anchor the depth-0 crawl sequence on (SURVEY.md §8.2).

Usage::

    python scripts/gen_seeds.py [--ref /root/reference] [--out data/seeds.parquet]
"""

from __future__ import annotations

import argparse
import os
import re

ENTRY_RE = re.compile(
    r'"((?:[^"\\]|\\.)+)"\s*:\s*\{\s*Description:\s*"((?:[^"\\]|\\.)*)"',
    re.S,
)


def parse_seeds(data_go_path: str) -> list[tuple[int, str, str]]:
    src = open(data_go_path, encoding="utf-8").read()
    start = src.index("PublicGeospatialDataSeeds = map[string]DataContext{")
    body = src[start:]
    out = []
    for i, m in enumerate(ENTRY_RE.finditer(body)):
        url = m.group(1).replace('\\"', '"')
        desc = m.group(2).replace('\\"', '"')
        out.append((i, url, desc))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "seeds.parquet"))
    args = ap.parse_args()

    rows = parse_seeds(os.path.join(args.ref, "internal/crawler/data.go"))
    if not rows:
        raise SystemExit("no seeds parsed — data.go format changed?")

    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "seed_order": pa.array([r[0] for r in rows], pa.int32()),
            "url": pa.array([r[1] for r in rows], pa.string()),
            "description": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    pq.write_table(table, args.out)
    print(f"wrote {len(rows)} seeds → {args.out}")


if __name__ == "__main__":
    main()
