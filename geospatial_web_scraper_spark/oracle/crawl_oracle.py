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
from ..functions.pyxxhash import spark_xxhash64_str
from ..kernel import extract_links, extract_metadata

OPEN_DATA_PATTERNS = ("/data/", "/download", "/dataset", "/geodata", "/gis/")


def py_canonicalize(url: str) -> str:
    """Mirror of functions.urls.canonicalize_url (fragment strip + lowercased
    scheme://authority head)."""
    nofrag = url.split("#", 1)[0]
    parts = nofrag.split("/")
    head = "/".join(parts[:3])
    return head.lower() + nofrag[len(head):]


def py_url_path(url: str) -> str:
    nofrag = url.split("#", 1)[0]
    parts = nofrag.split("/")
    head = "/".join(parts[:3])
    return nofrag[len(head):].split("?", 1)[0]


def py_url_host(url: str) -> str:
    nofrag = url.split("#", 1)[0]
    parts = nofrag.split("/")
    auth = parts[2] if len(parts) > 2 else ""
    return auth.split("@")[-1].split(":")[0].lower()


def py_url_hash(url: str) -> int:
    return spark_xxhash64_str(py_canonicalize(url))


def py_priority(url: str, is_geo: bool, depth: int) -> float:
    path = py_url_path(url).lower()
    hits = sum(1 for p in OPEN_DATA_PATTERNS if p in path)
    return (100.0 if is_geo else 0.0) + 10.0 * hits - float(depth)


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
    scheduler: dict | None = None,
    max_rounds: int = 64,
) -> CrawlResult:
    """``scheduler`` enables exact priority/politeness mode — the mirror of
    operators.politeness.PolitenessScheduler:

    ``dict(default_tokens=int, n_salts=int, host_budgets={host: n},
    robots={host: [disallow_prefixes]})``

    Within-round total order becomes (priority desc, url_hash asc) with the
    two-phase (host, salt) → host budget admission; overflow is deferred to
    the next round; budget-cut admitted rows are dropped (engine parity).
    """
    res = CrawlResult()
    seen: set[str] = set()
    seq = 0
    count = 0
    stopped = False

    # frontier entries: (parent_seq, pos, url, depth, parent_url, is_geo)
    frontier: list[tuple] = [
        (-1, pos, url, 0, None, False) for pos, url in enumerate(seed_urls)
    ]

    rnd = 0
    while frontier and not stopped and rnd < max_rounds:
        nxt: list[tuple] = []
        candidates_in = len(frontier)
        recorded = 0
        dedup_hits = 0

        # within-round first-wins dedup in (parent_seq, pos) order [F1]
        firsts: dict[str, tuple] = {}
        for t in sorted(frontier, key=lambda t: (t[0], t[1])):
            if t[2] in firsts:
                dedup_hits += 1
            else:
                firsts[t[2]] = t
        new = []
        for t in firsts.values():
            if t[2] in seen:
                dedup_hits += 1
            else:
                new.append(t)

        deferred: list[tuple] = []
        if scheduler is not None:
            robots = scheduler.get("robots", {})
            budgets = scheduler.get("host_budgets", {})
            default_tokens = scheduler.get("default_tokens", 40)
            n_salts = scheduler.get("n_salts", 8)

            passing = []
            for t in new:
                host = py_url_host(t[2])
                prefixes = robots.get(host)
                if prefixes and any(
                    py_url_path(t[2]).startswith(p) for p in prefixes
                ):
                    continue  # robots-disallowed: dropped, never recorded
                uh = py_url_hash(t[2])
                salt = uh % n_salts  # pmod on signed == unsigned here
                prio = py_priority(t[2], t[5], t[3])
                passing.append((t, host, uh, salt, prio))

            # phase A: per (host, salt) keep top budget by (prio desc, uh)
            by_hs: dict[tuple, list] = {}
            for rec in passing:
                by_hs.setdefault((rec[1], rec[3]), []).append(rec)
            phase_a = []
            overflow = []
            for key, lst in by_hs.items():
                lst.sort(key=lambda r: (-r[4], r[2]))
                budget = budgets.get(key[0], default_tokens)
                phase_a.extend(lst[:budget])
                overflow.extend(lst[budget:])
            # phase B: per host keep top budget of phase-A survivors
            by_h: dict[str, list] = {}
            for rec in phase_a:
                by_h.setdefault(rec[1], []).append(rec)
            admitted_recs = []
            for host, lst in by_h.items():
                lst.sort(key=lambda r: (-r[4], r[2]))
                budget = budgets.get(host, default_tokens)
                admitted_recs.extend(lst[:budget])
                overflow.extend(lst[budget:])
            admitted_recs.sort(key=lambda r: (-r[4], r[2]))
            admitted = [r[0] for r in admitted_recs]
            deferred = [r[0] for r in overflow]
        else:
            admitted = new  # already in (parent_seq, pos) order

        for t in admitted:
            parent_seq, pos, url, depth, parent_url, _ = t
            if max_crawl is not None and count > max_crawl:
                stopped = True
                break  # admitted-but-over-budget rows are dropped
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
                    nxt.append(
                        (my_seq, link["pos"], link["url"], depth + 1, url,
                         link["is_geo"])
                    )
        res.lineage.append((rnd, candidates_in, recorded, dedup_hits))
        frontier = nxt + deferred
        rnd += 1
    return res
