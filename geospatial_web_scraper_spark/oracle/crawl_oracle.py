"""Single-threaded reference oracle for the BFS crawl.

Implements the round-synchronous total-order contract of SURVEY.md §8.2 —
the deterministic restatement of the reference's racy channel loop
(``internal/crawler/crawler.go:26-80``):

* seeds enter in list order at depth 0;
* a URL is recorded (seq assigned, seen=true) at most once, first-wins
  (``crawler.go:57-62``);
* the budget check happens *before* each node: once ``count > max_crawl``
  every subsequent candidate is skipped un-recorded (``crawler.go:52-55``;
  note the reference therefore records up to ``max_crawl + 1`` URLs — we
  mirror that quirk exactly);
* recorded nodes are fetched: missing page / non-200 → leaf
  (``crawler.go:154-161``); geo MIME content type → terminal download, no
  expansion (``crawler.go:162-165``); otherwise links are extracted in
  document order and children enter the next round with depth+1 when
  ``depth + 1 < 4`` (``crawler.go:97-121``);
* within a round, candidates are ordered by (parent seq asc, document
  position asc) — FIFO BFS as if the worklist preserved spawn order.

This oracle shares the extraction kernel with the Spark engine, so its
``text`` outputs define the byte-identical-per-url invariant.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..constants import GEO_MIME_TYPES, MAX_DEPTH
from ..kernel import extract_links, extract_metadata


@dataclass
class CrawlResult:
    # (seq, url, depth, parent_url, round)
    trace: list[tuple[int, str, int, str | None, int]] = field(default_factory=list)
    # urls routed to the terminal-download sink (F7 branch)
    downloads: list[str] = field(default_factory=list)
    # url -> byte-identical extracted text (pages actually parsed as HTML)
    texts: dict[str, str] = field(default_factory=dict)
    # per-round lineage: (round, candidates_in, recorded, dedup_hits)
    lineage: list[tuple[int, int, int, int]] = field(default_factory=list)

    @property
    def seen(self) -> list[str]:
        return [t[1] for t in self.trace]


def crawl_oracle(
    pages: dict[str, dict],
    seed_urls: list[str],
    max_crawl: int | None = 400,
    max_depth: int = MAX_DEPTH,
) -> CrawlResult:
    res = CrawlResult()
    seen: set[str] = set()
    seq = 0
    count = 0
    stopped = False

    # frontier entries: (parent_seq, pos, url, depth, parent_url)
    frontier: list[tuple[int, int, str, int, str | None]] = [
        (-1, pos, url, 0, None) for pos, url in enumerate(seed_urls)
    ]

    rnd = 0
    while frontier and not stopped:
        nxt: list[tuple[int, int, str, int, str | None]] = []
        candidates_in = len(frontier)
        recorded = 0
        dedup_hits = 0
        for parent_seq, pos, url, depth, parent_url in sorted(
            frontier, key=lambda t: (t[0], t[1])
        ):
            if max_crawl is not None and count > max_crawl:
                stopped = True
                break
            if url in seen:
                dedup_hits += 1
                continue
            count += 1
            seen.add(url)
            res.trace.append((seq, url, depth, parent_url, rnd))
            my_seq = seq
            seq += 1
            recorded += 1

            row = pages.get(url)
            if row is None or row["status"] != 200:
                continue  # fetch miss / HTTP error → leaf (seen but no links)
            if row["content_type"] in GEO_MIME_TYPES:
                res.downloads.append(url)
                continue  # terminal download, no expansion
            links = extract_links(row["html"], url)
            res.texts[url] = extract_metadata(row["html"], url)["description"]
            if depth + 1 < max_depth:
                for link in links:
                    nxt.append((my_seq, link["pos"], link["url"], depth + 1, url))
        res.lineage.append((rnd, candidates_in, recorded, dedup_hits))
        frontier = nxt
        rnd += 1
    return res
