"""Rate-limited arXiv Atom API client (SURVEY.md §2.A, operator O-1).

The reference's collector drives the public arXiv API through the
``arxiv`` PyPI package with page_size=max_results, 3 s inter-page
delay, 3 retries, and an offset-resume loop that skips unexpectedly
empty pages (reference src/extract/arxiv_collector.py:45-49,255-303).
This module is the production implementation of the repo's ``FetchFn``
seam (collector.py) against the same PUBLIC endpoint
(https://info.arxiv.org/help/api/ — plain Atom over HTTP, no client
library needed), built on stdlib only:

  * pagination: ``start`` offset pages of ``page_size`` entries until
    ``max_results`` records or the feed runs dry;
  * politeness: a configurable inter-page delay (default 3 s, the
    published arXiv guidance and the reference's setting);
  * resilience: per-page retries with exponential backoff, and the
    reference's empty-page quirk handling — an HTTP-200 page with zero
    entries BEFORE the advertised total is reached advances the offset
    by one and continues instead of aborting the category;
  * parsing: Atom XML -> plain dicts with exactly the reference's
    record shape (entry_id/title/authors/summary/primary_category/
    categories/published/updated/journal_ref/doi), ready for
    ``RAW_RECORD_SCHEMA`` createDataFrame.

The transport and clock are injectable so tests replay recorded
fixture pages with zero network and zero sleeping; the default
transport is urllib. Per SURVEY §2.A the fetch stays DRIVER-side (the
reference keeps it on one client for IP-consistency); Spark takes over
from the returned dicts.
"""

from __future__ import annotations

import time
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET
from collections.abc import Callable, Iterator

ATOM_NS = "{http://www.w3.org/2005/Atom}"
ARXIV_NS = "{http://arxiv.org/schemas/atom}"
OPENSEARCH_NS = "{http://a9.com/-/spec/opensearch/1.1/}"

DEFAULT_BASE_URL = "https://export.arxiv.org/api/query"

Transport = Callable[[str], bytes]


def _urllib_transport(url: str) -> bytes:
    req = urllib.request.Request(
        url, headers={"User-Agent": "hackmd-data-pipeline-spark/0.1"})
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.read()


def _text(entry: ET.Element, tag: str) -> str | None:
    el = entry.find(ATOM_NS + tag)
    if el is None or el.text is None:
        return None
    return " ".join(el.text.split())  # Atom feeds hard-wrap with \n + indent


def parse_atom_page(payload: bytes) -> tuple[list[dict], int]:
    """One Atom page -> (records, advertised_total).

    ``advertised_total`` is opensearch:totalResults — the feed's own
    statement of how many entries the query matches, used to tell a
    legitimately-exhausted feed from the empty-page API quirk."""
    root = ET.fromstring(payload)
    total_el = root.find(OPENSEARCH_NS + "totalResults")
    try:
        total = int(total_el.text) if total_el is not None else 0
    except (TypeError, ValueError):
        total = 0
    records = []
    for entry in root.iter(ATOM_NS + "entry"):
        entry_id = _text(entry, "id")
        if not entry_id:
            continue
        prim = entry.find(ARXIV_NS + "primary_category")
        journal = entry.find(ARXIV_NS + "journal_ref")
        doi = entry.find(ARXIV_NS + "doi")
        records.append({
            "entry_id": entry_id,
            "title": _text(entry, "title"),
            "authors": [
                " ".join(n.text.split())
                for a in entry.findall(ATOM_NS + "author")
                for n in a.findall(ATOM_NS + "name") if n.text
            ],
            "summary": _text(entry, "summary"),
            "primary_category": (prim.get("term") if prim is not None else None),
            "categories": [
                c.get("term") for c in entry.findall(ATOM_NS + "category")
                if c.get("term")
            ],
            "published": _text(entry, "published"),
            "updated": _text(entry, "updated"),
            "journal_ref": (journal.text.strip()
                            if journal is not None and journal.text else None),
            "doi": (doi.text.strip() if doi is not None and doi.text else None),
        })
    return records, total


class ArxivAtomClient:
    """``FetchFn``-shaped client: ``client(category, max_results)``
    yields record dicts, newest submissions first."""

    def __init__(self, base_url: str = DEFAULT_BASE_URL,
                 page_size: int = 100, delay_seconds: float = 3.0,
                 num_retries: int = 3,
                 transport: Transport = _urllib_transport,
                 sleep: Callable[[float], None] = time.sleep):
        self.base_url = base_url
        self.page_size = page_size
        self.delay_seconds = delay_seconds
        self.num_retries = num_retries
        self.transport = transport
        self.sleep = sleep

    def _page_url(self, category: str, start: int, n: int) -> str:
        params = urllib.parse.urlencode({
            "search_query": f"cat:{category}",
            "start": start,
            "max_results": n,
            "sortBy": "submittedDate",
            "sortOrder": "descending",
        })
        return f"{self.base_url}?{params}"

    def _fetch_page(self, url: str) -> bytes:
        """Retry with exponential backoff (reference
        arxiv_collector.py:177-193's 3-attempt posture)."""
        last: Exception | None = None
        for attempt in range(self.num_retries + 1):
            try:
                return self.transport(url)
            except Exception as exc:  # noqa: BLE001 — transport-defined
                last = exc
                if attempt < self.num_retries:
                    self.sleep(self.delay_seconds * (2 ** attempt))
        raise RuntimeError(f"arXiv fetch failed after "
                           f"{self.num_retries + 1} attempts: {url}") from last

    def __call__(self, category: str, max_results: int) -> Iterator[dict]:
        offset = 0
        yielded = 0
        first_page = True
        while yielded < max_results:
            n = min(self.page_size, max_results - yielded)
            if not first_page:
                self.sleep(self.delay_seconds)
            first_page = False
            payload = self._fetch_page(self._page_url(category, offset, n))
            records, total = parse_atom_page(payload)
            if not records:
                if offset >= total:
                    return  # feed exhausted — normal end
                # the API's empty-page quirk mid-feed: resume one
                # offset further (reference arxiv_collector.py:301-303)
                offset += 1
                continue
            for rec in records:
                yield rec
                yielded += 1
                if yielded >= max_results:
                    return
            offset += len(records)
