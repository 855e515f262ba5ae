"""ArxivAtomClient (O-1 production fetch) against recorded fixture
pages — no network, no real sleeping: the transport and clock are
injected. Pins the reference client behaviors (pagination, 3 s
inter-page delay, retry/backoff, empty-page offset-resume — reference
arxiv_collector.py:45-49,255-303) and the Atom record shape, then runs
the full Collector end-to-end on the client.
"""

from __future__ import annotations

import pytest

from hackmd_data_pipeline_spark.sources.arxiv_api import (
    ArxivAtomClient,
    parse_atom_page,
)


def _entry(i: int, cat: str = "cs.DB") -> str:
    return f"""
  <entry>
    <id>http://arxiv.org/abs/2401.{i:05d}v1</id>
    <updated>2024-01-1{i % 10}T10:00:00Z</updated>
    <published>2024-01-0{i % 9 + 1}T10:00:00Z</published>
    <title>Paper {i}:
      a hard-wrapped
      title</title>
    <summary>  Summary of paper {i}
      continues here.  </summary>
    <author><name>Alice {i}</name></author>
    <author><name>Bob {i}</name></author>
    <arxiv:primary_category xmlns:arxiv="http://arxiv.org/schemas/atom"
      term="{cat}"/>
    <category term="{cat}"/>
    <category term="stat.ML"/>
    <arxiv:doi xmlns:arxiv="http://arxiv.org/schemas/atom">10.1000/x{i}</arxiv:doi>
  </entry>"""


def _page(entries: list[int], total: int) -> bytes:
    body = "".join(_entry(i) for i in entries)
    return f"""<?xml version="1.0" encoding="UTF-8"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>ArXiv Query</title>
  <opensearch:totalResults
    xmlns:opensearch="http://a9.com/-/spec/opensearch/1.1/">{total}</opensearch:totalResults>
  {body}
</feed>""".encode()


class _Clock:
    def __init__(self):
        self.sleeps: list[float] = []

    def __call__(self, secs: float) -> None:
        self.sleeps.append(secs)


def test_parse_atom_page_record_shape():
    recs, total = parse_atom_page(_page([7], total=1))
    assert total == 1
    (r,) = recs
    assert r["entry_id"] == "http://arxiv.org/abs/2401.00007v1"
    assert r["title"] == "Paper 7: a hard-wrapped title"  # unwrapped
    assert r["summary"].startswith("Summary of paper 7 continues")
    assert r["authors"] == ["Alice 7", "Bob 7"]
    assert r["primary_category"] == "cs.DB"
    assert r["categories"] == ["cs.DB", "stat.ML"]
    assert r["published"] == "2024-01-08T10:00:00Z"
    assert r["doi"] == "10.1000/x7"
    assert r["journal_ref"] is None


def test_pagination_and_interpage_delay():
    pages = {0: _page([0, 1], 5), 2: _page([2, 3], 5), 4: _page([4], 5)}
    urls: list[str] = []

    def transport(url: str) -> bytes:
        urls.append(url)
        start = int(url.split("start=")[1].split("&")[0])
        return pages[start]

    clock = _Clock()
    client = ArxivAtomClient(page_size=2, transport=transport, sleep=clock)
    got = list(client("cs.DB", 5))
    assert [r["entry_id"][-3:] for r in got] == ["0v1", "1v1", "2v1", "3v1", "4v1"]
    assert len(urls) == 3
    assert "search_query=cat%3Acs.DB" in urls[0]
    assert "sortBy=submittedDate" in urls[0]
    # 3 s delay BETWEEN pages, none before the first
    assert clock.sleeps == [3.0, 3.0]


def test_max_results_truncates_midpage():
    transport = lambda url: _page([0, 1, 2, 3], 100)  # noqa: E731
    client = ArxivAtomClient(page_size=4, transport=transport,
                             sleep=_Clock())
    assert len(list(client("cs.DB", 3))) == 3


def test_retry_backoff_then_success():
    calls = {"n": 0}

    def flaky(url: str) -> bytes:
        calls["n"] += 1
        if calls["n"] <= 2:
            raise ConnectionError("boom")
        start = int(url.split("start=")[1].split("&")[0])
        return _page([1], 1) if start == 0 else _page([], 1)

    clock = _Clock()
    client = ArxivAtomClient(transport=flaky, sleep=clock, num_retries=3)
    assert len(list(client("cs.DB", 1))) == 1
    assert clock.sleeps == [3.0, 6.0]  # exponential backoff


def test_retries_exhausted_raises():
    def dead(url: str) -> bytes:
        raise ConnectionError("down")

    client = ArxivAtomClient(transport=dead, sleep=_Clock(), num_retries=2)
    with pytest.raises(RuntimeError, match="after 3 attempts"):
        list(client("cs.DB", 1))


def test_empty_page_offset_resume():
    """An HTTP-200 page with zero entries BEFORE the advertised total
    must advance the offset by one and continue (the reference's
    UnexpectedEmptyPageError handling), not end the scan."""
    pages = {0: _page([0, 1], 4), 2: _page([], 4), 3: _page([2, 3], 4)}

    def transport(url: str) -> bytes:
        start = int(url.split("start=")[1].split("&")[0])
        return pages.get(start, _page([], 4))  # past-the-end -> empty

    client = ArxivAtomClient(page_size=2, transport=transport,
                             sleep=_Clock())
    got = [r["entry_id"][-3:] for r in client("cs.DB", 10)]
    assert got == ["0v1", "1v1", "2v1", "3v1"]


def test_feed_exhausted_stops_cleanly():
    pages = {0: _page([0, 1], 2), 2: _page([], 2)}

    def transport(url: str) -> bytes:
        start = int(url.split("start=")[1].split("&")[0])
        return pages[start]

    client = ArxivAtomClient(page_size=2, transport=transport,
                             sleep=_Clock())
    assert len(list(client("cs.DB", 50))) == 2


def test_collector_end_to_end_with_atom_client(spark, tmp_path):
    """The real client class drives the full Collector pipeline
    (register -> fetch -> dedup -> gzip-JSONL -> state flips) against
    fixture pages."""
    from hackmd_data_pipeline_spark.collector import Collector

    def transport(url: str) -> bytes:
        start = int(url.split("start=")[1].split("&")[0])
        if start >= 4:
            return _page([], 4)
        return _page([start, start + 1], 4)

    client = ArxivAtomClient(page_size=2, transport=transport,
                             sleep=_Clock())
    c = Collector(spark, str(tmp_path), client, ["cs.DB"],
                  categories_per_run=1, max_results=10, batch_size=2,
                  lookback_months=600)
    assert c.drain() == 1
    raw = spark.read.schema(
        __import__("hackmd_data_pipeline_spark.schemas",
                   fromlist=["RAW_RECORD_SCHEMA"]).RAW_RECORD_SCHEMA
    ).json(f"{tmp_path}/raw/*/*/*.json.gz")
    assert raw.count() == 4
    assert set(raw.toPandas()["primary_category"]) == {"cs.DB"}
