"""REST adapter tests mirroring the reference's API-layer suite
(tests/test_geckoterminal_etls.py:79-312): success, 429-then-success
with backoff timing, retries exhausted, non-retryable statuses."""

import pytest

from etl_pipelines_spark.sources.rest import (
    RetriesExhausted,
    fetch_with_backoff,
    land_records,
    paginated_records,
)


class Script:
    """Scripted fetch: returns queued (status, payload) responses."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.calls = 0

    def __call__(self, url):
        self.calls += 1
        return self.responses.pop(0)


def test_success_first_try():
    fetch = Script([(200, {"ok": 1})])
    assert fetch_with_backoff(fetch, "u", sleep=lambda s: None) == {"ok": 1}
    assert fetch.calls == 1


def test_429_then_success_backs_off_exponentially():
    fetch = Script([(429, None), (429, None), (200, "data")])
    sleeps = []
    got = fetch_with_backoff(fetch, "u", sleep=sleeps.append)
    assert got == "data"
    assert sleeps == [1.0, 2.0]  # base * 2^attempt


def test_backoff_caps_at_max_delay():
    fetch = Script([(503, None)] * 7 + [(200, "x")])
    sleeps = []
    with pytest.raises(RetriesExhausted):
        fetch_with_backoff(fetch, "u", max_retries=6, sleep=sleeps.append)
    assert sleeps == [1.0, 2.0, 4.0, 8.0, 16.0, 32.0]  # capped at 32


def test_retries_exhausted_raises_with_status():
    fetch = Script([(429, None)] * 6)
    with pytest.raises(RetriesExhausted) as e:
        fetch_with_backoff(fetch, "u", max_retries=5, sleep=lambda s: None)
    assert e.value.last_status == 429
    assert fetch.calls == 6


def test_non_retryable_raises_immediately():
    fetch = Script([(404, None)])
    with pytest.raises(RuntimeError, match="404"):
        fetch_with_backoff(fetch, "u", sleep=lambda s: None)
    assert fetch.calls == 1


def test_pagination_until_empty_page():
    pages = {1: [{"id": 1}, {"id": 2}], 2: [{"id": 3}], 3: []}
    fetch = lambda url: (200, pages[int(url.split("=")[1])])
    got = list(paginated_records(fetch, lambda p: f"u?page={p}"))
    assert [r["id"] for r in got] == [1, 2, 3]


def test_land_records_explicit_schema(spark):
    df = land_records(spark, [{"id": 1, "name": "a"}], "id long, name string")
    assert df.schema.simpleString() == "struct<id:bigint,name:string>"
    assert df.count() == 1
